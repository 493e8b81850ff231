"""Every shipped data-mixture config parses into DomainConfig with
consistent per-domain keys (parity family: reference config/data/ —
44 single-dataset configs + the exp-m mixture)."""
import glob
import os

from lightretriever_tpu.arguments import DomainConfig

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "config", "data")


def _all_config_paths():
    return (glob.glob(os.path.join(CFG_DIR, "*.json"))
            + glob.glob(os.path.join(CFG_DIR, "single_dataset", "*.json")))


def test_config_family_present():
    singles = glob.glob(os.path.join(CFG_DIR, "single_dataset", "*.json"))
    assert len(singles) >= 44
    assert os.path.exists(os.path.join(CFG_DIR, "exp-m.json"))


def test_all_configs_parse_and_are_consistent():
    paths = _all_config_paths()
    assert paths
    for path in paths:
        cfg = DomainConfig.from_json(path)
        names = set(cfg.domain_ids)
        assert names, path
        assert set(cfg.domain_weights) == names, path
        for fieldmap in (cfg.size, cfg.epoch, cfg.ref_length, cfg.task_type):
            if fieldmap:
                assert set(fieldmap) == names, path
        w = cfg.normalized_weights()
        assert abs(sum(w.values()) - 1.0) < 1e-9, path


def test_exp_m_is_a_real_mixture():
    cfg = DomainConfig.from_json(os.path.join(CFG_DIR, "exp-m.json"))
    assert len(cfg.domain_ids) >= 20  # the reference recipe's 23 domains
    # msmarco dominates the canonical mixture
    w = cfg.normalized_weights()
    assert max(w, key=w.get) == "msmarco"
