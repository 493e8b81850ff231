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


def test_model_args_family_pad_sep_defaults():
    """Unset pad/sep resolve to backbone-family defaults in __post_init__
    (parity: reference arguments.py:283-310)."""
    from lightretriever_tpu.arguments import ModelArguments

    ma = ModelArguments(model_name_or_path="meta-llama/Llama-3.1-8B")
    assert ma.pad_token == "<|reserved_special_token_0|>"
    assert ma.sep_token == "<|reserved_special_token_1|>"
    ma = ModelArguments(model_name_or_path="Qwen/Qwen2.5-7B")
    assert ma.pad_token == "<|im_end|>"
    ma = ModelArguments(model_name_or_path="mistralai/Mistral-7B-v0.3")
    assert ma.pad_token == "[control_8]" and ma.sep_token == "[/INST]"
    # explicit values win
    ma = ModelArguments(model_name_or_path="Qwen/Qwen2.5-7B", pad_token="<x>")
    assert ma.pad_token == "<x>"
    # no model path: generic placeholders stay None for downstream "or" defaults
    assert ModelArguments().pad_token is None
