"""Ray Data ``map_batches`` stages and actor classes.

Stateless transforms are plain functions (Arrow in / Arrow out,
``batch_format="pyarrow"``); stateful stages (models, alias dicts,
embedding matrices) are callable classes run as actor pools with setup
in ``__init__`` — the Ray-idiomatic lift of the reference's
load-pickle-then-loop pattern (``hmm_ner.py:130-156``).
"""
