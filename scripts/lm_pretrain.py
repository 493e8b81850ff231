"""Next-token LM pretraining on the in-image harvested corpus (round 3).

The reference's retrieval quality rests on pretrained init (Llama-3.1-8B,
/root/reference/scripts/finetune_example.sh:18); zero egress means no
checkpoints, so this script *makes* one: a from-scratch decoder pretrained
on ~430MB of in-image text (scripts/harvest_pretrain_corpus.py), saved in
HF layout for `quality_study.py --init-trunk` warm starts.

TPU-first design: packed 256-token blocks (no padding, no masks — pure
causal MXU work), bf16 params with fp32 Adam moments, one jit step, host
RNG block sampling (deterministic + resumable), checkpoint/auto-resume
across tunnel flakes.

Usage:
  python scripts/harvest_pretrain_corpus.py --out /tmp/pretrain_corpus.jsonl \
      --queries /tmp/docstring_beir/queries.jsonl
  python scripts/lm_pretrain.py --data /tmp/pretrain_corpus.jsonl \
      --extra-corpus /tmp/docstring_beir/corpus.jsonl --out /tmp/lm_pt
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from lightretriever_tpu.inference.utils import ensure_device_alive

ensure_device_alive()


def build_tokenizer(data_path, extra_corpus, vocab_size, out_dir, sample_mb=80):
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    def texts():
        budget = sample_mb * 1e6
        with open(data_path) as f:
            for line in f:
                t = json.loads(line)["text"]
                budget -= len(t)
                yield t
                if budget < 0:
                    break
        if extra_corpus:  # make sure eval-corpus terms are in-vocab
            with open(extra_corpus) as f:
                for line in f:
                    d = json.loads(line)
                    yield d.get("title", "") + " " + d.get("text", "")

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size,
        # 430MB of source text carries a huge unicode alphabet (CJK comments
        # etc.); without a cap the initial alphabet alone can exceed
        # vocab_size (observed: 70k+ tokens from a 32k request), which also
        # overflows the uint16 token bin. 3000 covers ASCII + common symbols.
        limit_alphabet=3000,
        special_tokens=["<pad>", "<bos>", "<eos>", "<unk>"])
    tok.train_from_iterator(texts(), trainer)
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<pad>", bos_token="<bos>",
        eos_token="<eos>", unk_token="<unk>")
    fast.save_pretrained(out_dir)
    return fast


def build_token_bin(tok, data_path, bin_path, batch=2048):
    """Tokenize the whole corpus into one uint16 stream (eos-separated)."""
    assert len(tok) < 2**16, f"vocab {len(tok)} overflows the uint16 bin"
    eos = tok.eos_token_id
    n_tokens = 0
    t0 = time.perf_counter()
    with open(bin_path, "wb") as out, open(data_path) as f:
        buf = []
        done = False
        while not done:
            buf.clear()
            for line in f:
                buf.append(json.loads(line)["text"])
                if len(buf) >= batch:
                    break
            else:
                done = True
            if not buf:
                break
            enc = tok(buf, add_special_tokens=False)["input_ids"]
            flat = []
            for ids in enc:
                flat.extend(ids)
                flat.append(eos)
            arr = np.asarray(flat, np.uint16)
            arr.tofile(out)
            n_tokens += arr.size
    print(f"token bin: {n_tokens/1e6:.1f}M tokens in "
          f"{time.perf_counter()-t0:.0f}s -> {bin_path}", flush=True)
    return n_tokens


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--extra-corpus", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--vocab", type=int, default=32768)
    ap.add_argument("--hidden", type=int, default=640)
    ap.add_argument("--layers", type=int, default=10)
    ap.add_argument("--heads", type=int, default=10)
    ap.add_argument("--kv-heads", type=int, default=5)
    ap.add_argument("--intermediate", type=int, default=1920)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--lr", type=float, default=6e-4)
    ap.add_argument("--warmup", type=int, default=1000)
    ap.add_argument("--wd", type=float, default=0.01)
    ap.add_argument("--clip", type=float, default=1.0)
    ap.add_argument("--log-steps", type=int, default=100)
    ap.add_argument("--ckpt-steps", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import optax

    from lightretriever_tpu.models import decoder as dec
    from lightretriever_tpu.models.config import DecoderConfig
    from lightretriever_tpu.models.hf_loader import save_decoder_params

    # --- tokenizer + token stream (cached) ----------------------------------
    tok_dir = os.path.join(args.out, "tokenizer")
    if os.path.exists(os.path.join(tok_dir, "tokenizer.json")):
        from transformers import PreTrainedTokenizerFast

        tok = PreTrainedTokenizerFast.from_pretrained(tok_dir)
    else:
        t0 = time.perf_counter()
        tok = build_tokenizer(args.data, args.extra_corpus, args.vocab, tok_dir)
        print(f"tokenizer: {len(tok)} in {time.perf_counter()-t0:.0f}s", flush=True)
    bin_path = os.path.join(args.out, "tokens.bin")
    if not os.path.exists(bin_path):
        build_token_bin(tok, args.data, bin_path)
    tokens = np.memmap(bin_path, dtype=np.uint16, mode="r")
    n_tok = tokens.shape[0]
    print(f"corpus: {n_tok/1e6:.1f}M tokens; "
          f"{args.steps * args.batch * args.seq / n_tok:.1f} epochs", flush=True)

    # --- model + optimizer --------------------------------------------------
    cfg = DecoderConfig(
        vocab_size=len(tok), hidden_size=args.hidden,
        intermediate_size=args.intermediate, num_hidden_layers=args.layers,
        num_attention_heads=args.heads, num_key_value_heads=args.kv_heads,
        max_position_embeddings=args.seq, rms_norm_eps=1e-6,
        rope_theta=1e4, tie_word_embeddings=True)
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    params = dec.init_params(cfg, jax.random.key(args.seed), dtype)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    print(f"model: {n_params/1e6:.1f}M params dtype={dtype.__name__} "
          f"backend={jax.default_backend()}", flush=True)

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, args.warmup, args.steps, end_value=args.lr * 0.1)
    no_decay = lambda path, _: not any(
        "layernorm" in str(k).lower() or "norm" in str(k) for k in path)
    tx = optax.chain(
        optax.clip_by_global_norm(args.clip),
        optax.adamw(schedule, b1=0.9, b2=0.95, weight_decay=args.wd,
                    mask=lambda p: jax.tree_util.tree_map_with_path(no_decay, p),
                    mu_dtype=jnp.float32),
    )
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, x, y):
        def loss_fn(p):
            # remat + chunked CE: at 164M params (B=64 S=256 V=32k) the
            # unchunked path OOMs v5e-1 — full fp32 logits are ~2.1GB plus
            # backward temps, and saved per-layer QKV adds ~4GB more.
            h = dec.forward(p, x, config=cfg, causal=True,
                            attn_impl="xla", remat=True)["last_hidden_state"]
            C = 32  # seq chunk; peak extra memory = B*C*V fp32 (~256MB)
            hc = h.reshape(h.shape[0], -1, C, h.shape[-1]).swapaxes(0, 1)
            yc = y.reshape(y.shape[0], -1, C).swapaxes(0, 1)

            @jax.checkpoint
            def ce(hs, ys):
                lg = dec.logits(p, hs, cfg).astype(jnp.float32)
                return optax.softmax_cross_entropy_with_integer_labels(
                    lg, ys).sum()

            tot = jax.lax.scan(
                lambda c, xs: (c + ce(*xs), None),
                jnp.zeros((), jnp.float32), (hc, yc))[0]
            return tot / y.size

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # --- resume -------------------------------------------------------------
    ckpt_path = os.path.join(args.out, "ckpt.npz")
    start = 0
    leaves, treedef = jax.tree_util.tree_flatten((params, opt_state))
    if os.path.exists(ckpt_path):
        with np.load(ckpt_path) as z:
            start = int(z["step"])
            loaded = []
            for i, l in enumerate(leaves):
                a = z[f"l{i}"]
                if (a.dtype.kind == "V" and a.dtype.itemsize == 2) or (
                        a.dtype == np.uint16 and l.dtype == jnp.bfloat16):
                    import ml_dtypes  # bf16 bit patterns (legacy V2 / uint16)

                    a = a.view(ml_dtypes.bfloat16)
                loaded.append(jnp.asarray(a).astype(l.dtype))
        params, opt_state = jax.tree_util.tree_unflatten(treedef, loaded)
        print(f"resumed from step {start}", flush=True)

    def save(step, params, opt_state):
        ls = jax.tree_util.tree_leaves((params, opt_state))
        # bf16 leaves round-trip npz as void-V2 (same class as the projector
        # npz bug, 66dc09f): store them as uint16 bit patterns instead; the
        # load path views V2 back, and uint16 restores via .view too.
        arrs = {}
        for i, l in enumerate(ls):
            a = np.asarray(jax.device_get(l))
            if a.dtype == jnp.bfloat16:
                a = a.view(np.uint16)
            arrs[f"l{i}"] = a
        tmp = ckpt_path + ".tmp.npz"
        np.savez(tmp, step=step, **arrs)
        os.replace(tmp, ckpt_path)

    # --- train --------------------------------------------------------------
    B, S = args.batch, args.seq
    log_path = os.path.join(args.out, "train_log.jsonl")
    t0 = time.perf_counter()
    loss_dev = None
    # Mid-run wedge guard (LR_STEP_WATCHDOG_S; inference.utils.StepWatchdog):
    # the 24k-step pretrain is the longest single chip job in the chains — a
    # wedged tunnel here must exit 17 and resume from ckpt.npz, not hang.
    from lightretriever_tpu.inference.utils import StepWatchdog
    wd = StepWatchdog.from_env(name="lm_pretrain")
    try:
        for step in range(start, args.steps):
            rng = np.random.default_rng((args.seed << 20) + step)
            offs = rng.integers(0, n_tok - S - 1, size=B)
            blk = np.stack([tokens[o:o + S + 1] for o in offs]).astype(np.int32)
            x, y = blk[:, :-1], blk[:, 1:]
            params, opt_state, loss_dev = step_fn(params, opt_state, x, y)
            if (step + 1) % args.log_steps == 0:
                loss = float(loss_dev)  # sync point
                dt = (time.perf_counter() - t0) / args.log_steps * 1000
                t0 = time.perf_counter()
                rec = {"step": step + 1, "loss": round(loss, 4),
                       "ppl": round(float(np.exp(min(loss, 20))), 2),
                       "ms_per_step": round(dt, 1),
                       "lr": float(schedule(step))}
                print(json.dumps(rec), flush=True)
                with open(log_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
            if (step + 1) % args.ckpt_steps == 0 or step + 1 == args.steps:
                save(step + 1, params, opt_state)
            if wd is not None:
                wd.beat()
    finally:
        if wd is not None:
            wd.stop()

    # --- export HF layout for warm starts -----------------------------------
    model_dir = os.path.join(args.out, "model")
    save_decoder_params(jax.device_get(params), cfg, model_dir)
    tok.save_pretrained(model_dir)
    print(f"saved HF-layout trunk -> {model_dir}", flush=True)


if __name__ == "__main__":
    main()
