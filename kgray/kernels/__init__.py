"""Pure compute kernels (NumPy / plain Python) — no Ray imports here.

These are the sequential building blocks the Ray Data stages call per
batch.  Keeping them Ray-free makes them unit-testable against brute
force and against the reference scripts.
"""
