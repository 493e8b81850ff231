"""Tokenizer loading + JSON surgery for GPT-family tokenizers.

Behavioral parity with the reference's tokenizer pipeline
(reference: utils/data_utils.py:29-281): right padding, optional pad/sep
special tokens (reusing reserved vocab slots to avoid embedding resize),
a Lowercase normalizer spliced into the normalizer chain, and a
TemplateProcessing post-processor emitting ``[bos]*n  text  [eos]*n
[pooling_token]*n``. Tokenization stays host-side Rust (HF tokenizers) in the
TPU design — only the surgery logic is reimplemented.
"""
from __future__ import annotations

import json
from typing import Optional

POOLING_TOKENS = ["<|pooling_token_0|>", "<|pooling_token_1|>", "<|pooling_token_2|>"]

# Model-family default pad/sep tokens (parity: arguments.py:283-310).
MODEL_SPECIAL_TOKEN_DEFAULTS = {
    "qwen": {"pad_token": "<|im_end|>", "sep_token": "<|im_start|>"},
    "llama3": {"pad_token": "<|reserved_special_token_0|>",
               "sep_token": "<|reserved_special_token_1|>"},
    "mistral-v0.1": {"pad_token": "<unk>", "sep_token": "<s>"},
    "mistral-v0.3": {"pad_token": "[control_8]", "sep_token": "[/INST]"},
    "gemma": {"pad_token": "<|pad|>", "sep_token": "<bos>"},
}


def default_special_tokens(model_name_or_path: str) -> dict[str, str]:
    name = (model_name_or_path or "").lower()
    if "qwen" in name:
        return MODEL_SPECIAL_TOKEN_DEFAULTS["qwen"]
    if "llama-3" in name or "llama3" in name:
        return MODEL_SPECIAL_TOKEN_DEFAULTS["llama3"]
    if "mistral-7b-v0.3" in name:
        return MODEL_SPECIAL_TOKEN_DEFAULTS["mistral-v0.3"]
    if "mistral" in name:
        return MODEL_SPECIAL_TOKEN_DEFAULTS["mistral-v0.1"]
    if "gemma" in name:
        return MODEL_SPECIAL_TOKEN_DEFAULTS["gemma"]
    return {"pad_token": "<|pad|>", "sep_token": "<|sep|>"}


def load_tokenizer(
    model_name_or_path: str,
    use_fast: bool = True,
    edit_tokenizer_normalizers: bool = True,
    lowercase: bool = False,
    edit_tokenizer_post_processor: bool = True,
    add_bos_num: int = -1,
    add_eos_num: int = -1,
    add_pooling_token_num: int = -1,
    add_pad_token: bool = True,
    pad_token: str = "<|pad|>",
    add_sep_token: bool = False,
    sep_token: str = "<|sep|>",
):
    """Load + surgically edit an HF fast tokenizer (parity: data_utils.py:29-135)."""
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(model_name_or_path, use_fast=use_fast)
    return edit_tokenizer(
        tokenizer,
        edit_tokenizer_normalizers=edit_tokenizer_normalizers,
        lowercase=lowercase,
        edit_tokenizer_post_processor=edit_tokenizer_post_processor,
        add_bos_num=add_bos_num,
        add_eos_num=add_eos_num,
        add_pooling_token_num=add_pooling_token_num,
        add_pad_token=add_pad_token,
        pad_token=pad_token,
        add_sep_token=add_sep_token,
        sep_token=sep_token,
    )


def edit_tokenizer(
    tokenizer,
    edit_tokenizer_normalizers: bool = True,
    lowercase: bool = False,
    edit_tokenizer_post_processor: bool = True,
    add_bos_num: int = -1,
    add_eos_num: int = -1,
    add_pooling_token_num: int = -1,
    add_pad_token: bool = True,
    pad_token: str = "<|pad|>",
    add_sep_token: bool = False,
    sep_token: str = "<|sep|>",
):
    """Apply the full surgery to an already-loaded fast tokenizer."""
    tokenizer.padding_side = "right"

    if add_bos_num > 0 and tokenizer.bos_token is None:
        tokenizer.add_special_tokens({"bos_token": "<|bos|>"})
    if add_eos_num > 0 and tokenizer.eos_token is None:
        tokenizer.add_special_tokens({"eos_token": "<|eos|>"})
    if add_pad_token and tokenizer.pad_token is None:
        tokenizer.add_special_tokens({"pad_token": pad_token})
    if add_sep_token and tokenizer.sep_token is None:
        tokenizer.add_special_tokens({"sep_token": sep_token})
    if add_pooling_token_num > 0:
        tokenizer.add_special_tokens(
            {"additional_special_tokens": POOLING_TOKENS},
            replace_additional_special_tokens=False,
        )

    if edit_tokenizer_normalizers and lowercase:
        _splice_lowercase_normalizer(tokenizer)
    if edit_tokenizer_post_processor:
        _set_template_post_processor(
            tokenizer, add_bos_num, add_eos_num, add_pooling_token_num
        )
    return tokenizer


def _splice_lowercase_normalizer(tokenizer) -> None:
    """Insert a Lowercase normalizer at the head of the chain
    (parity: data_utils.py:124-154)."""
    assert tokenizer.is_fast, "normalizer surgery needs a fast tokenizer"
    lower = {"type": "Lowercase"}
    tj = json.loads(tokenizer._tokenizer.to_str())
    norm = tj.get("normalizer")
    if isinstance(norm, dict) and "type" in norm:
        if norm["type"] == "Lowercase":
            return
        if norm["type"] == "Sequence":
            if not any(n.get("type") == "Lowercase" for n in norm["normalizers"]):
                norm["normalizers"].insert(0, lower)
        else:
            tj["normalizer"] = {"type": "Sequence", "normalizers": [lower, norm]}
    else:
        tj["normalizer"] = lower
    tokenizer._tokenizer = tokenizer._tokenizer.from_str(json.dumps(tj))


def _template_exprs(tokenizer, add_bos_num, add_eos_num, add_pooling_token_num):
    single, pair, special = [], [], {}

    def special_expr(token, token_id):
        special[token] = {"id": token, "ids": [token_id], "tokens": [token]}
        return {"SpecialToken": {"id": token, "type_id": 0}}

    if add_bos_num > 0:
        assert tokenizer.bos_token is not None
        bos = special_expr(tokenizer.bos_token, tokenizer.bos_token_id)
        single.extend([bos] * add_bos_num)
        pair.extend([bos] * add_bos_num)

    a = {"Sequence": {"id": "A", "type_id": 0}}
    b = {"Sequence": {"id": "B", "type_id": 0}}
    single.append(a)
    pair.extend([a, b])  # GPT-style: no separator between A and B

    if add_eos_num > 0:
        assert tokenizer.eos_token is not None
        eos = special_expr(tokenizer.eos_token, tokenizer.eos_token_id)
        single.extend([eos] * add_eos_num)
        pair.extend([eos] * add_eos_num)
    elif tokenizer.eos_token is not None:
        special_expr(tokenizer.eos_token, tokenizer.eos_token_id)

    if add_pooling_token_num > 0:
        assert add_pooling_token_num <= 3, "at most 3 pooling tokens supported"
        for i in range(add_pooling_token_num):
            tid = tokenizer.convert_tokens_to_ids(POOLING_TOKENS[i])
            expr = special_expr(POOLING_TOKENS[i], tid)
            single.append(expr)
            pair.append(expr)
    return single, pair, special


def _set_template_post_processor(
    tokenizer, add_bos_num=-1, add_eos_num=-1, add_pooling_token_num=-1
) -> None:
    """Install/replace a TemplateProcessing post-processor
    (parity: data_utils.py:157-269)."""
    if add_bos_num < 0 and add_eos_num < 0 and add_pooling_token_num < 0:
        return
    assert tokenizer.is_fast, "post-processor surgery needs a fast tokenizer"
    single, pair, special = _template_exprs(
        tokenizer, add_bos_num, add_eos_num, add_pooling_token_num
    )
    template = {"type": "TemplateProcessing", "single": single, "pair": pair,
                "special_tokens": special}
    tj = json.loads(tokenizer._tokenizer.to_str())
    pp = tj.get("post_processor")
    if isinstance(pp, dict) and "type" in pp:
        if pp["type"] == "TemplateProcessing":
            tj["post_processor"] = template
        elif pp["type"] == "Sequence":
            procs = pp["processors"]
            for i, proc in enumerate(procs):
                if proc["type"] == "TemplateProcessing":
                    procs[i] = template
                    break
            else:
                procs.append(template)
        else:
            tj["post_processor"] = {"type": "Sequence", "processors": [pp, template]}
    else:
        tj["post_processor"] = template
    tokenizer._tokenizer = tokenizer._tokenizer.from_str(json.dumps(tj))


def resize_vocab_for_tokenizer(params: dict, config, tokenizer, pad_to_multiple_of: Optional[int] = 128):
    """Grow embed_tokens/lm_head rows if surgery enlarged the vocab
    (parity: resize_emb, data_utils.py:273-281). Returns (params, new_config).

    TPU note: pads to a multiple of 128 by default so the vocab dim stays
    MXU-lane aligned.
    """
    import dataclasses

    import numpy as np

    new_len = len(tokenizer)
    if pad_to_multiple_of:
        new_len = (new_len + pad_to_multiple_of - 1) // pad_to_multiple_of * pad_to_multiple_of
    old_v = params["embed_tokens"].shape[0]
    if new_len <= old_v:
        return params, config
    emb = np.asarray(params["embed_tokens"])
    mean = emb.mean(axis=0, keepdims=True)
    extra = np.repeat(mean, new_len - old_v, axis=0)
    params = dict(params)
    params["embed_tokens"] = np.concatenate([emb, extra], axis=0)
    if "lm_head" in params:
        head = np.asarray(params["lm_head"])
        mean_h = head.mean(axis=1, keepdims=True)
        params["lm_head"] = np.concatenate(
            [head, np.repeat(mean_h, new_len - old_v, axis=1)], axis=1
        )
    config = dataclasses.replace(config, vocab_size=new_len)
    return params, config
