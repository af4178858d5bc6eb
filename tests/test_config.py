

def test_boolean_override_typo_guard(tmp_path):
    """A typo'd boolean override (remat=Flase) must raise instead of landing
    as a truthy string; case-insensitive true/false/yes/no are coerced."""
    import pytest
    from amcontrast3d_tpu.utils.config import EasyConfig

    cfg = EasyConfig()
    cfg.update({"ambiguity_args": {"remat": False, "nu": 0.5}})
    cfg._update_from_opts(["ambiguity_args.remat=TRUE"])
    assert cfg.ambiguity_args.remat is True
    cfg._update_from_opts(["ambiguity_args.remat=no"])
    assert cfg.ambiguity_args.remat is False
    with pytest.raises(ValueError, match="remat"):
        cfg._update_from_opts(["ambiguity_args.remat=Flase"])
    # non-bool keys keep permissive literal_eval-or-string behavior
    cfg._update_from_opts(["ambiguity_args.nu=0.6", "mode=test"])
    assert cfg.ambiguity_args.nu == 0.6
    assert cfg.mode == "test"
