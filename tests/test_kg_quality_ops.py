

def test_alias_patch_incremental_equals_full(ray_session):
    """Alias-delta maintenance law: the incremental plan (re-link only
    sentences containing a patched surface, splice with the v1 linked
    checkpoint) equals a full re-link under the patched index — and
    the patch genuinely moves triples (non-vacuous)."""
    import __ray_entry__ as entry
    from kgray.pipelines.graph import kg_alias_patch

    def canon(df):
        cols = sorted(df.columns)
        return df[cols].sort_values(cols, ignore_index=True)

    sf = "/root/testdata/sf0.001"
    inc = canon(kg_alias_patch(sf, plan="incremental").to_pandas())
    full = canon(kg_alias_patch(sf, plan="full").to_pandas())
    assert inc.equals(full)
    v1 = canon(entry._kg_graph(sf).to_pandas())
    assert not inc.equals(v1)
