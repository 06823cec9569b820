"""Device-side decode-stage profiler (run plain on the TPU, no args).

Times the components of one KV-cached decode step for whisper-base at
production shapes, isolating where per-step time goes:

  * full 64-step greedy generate (the production path)
  * bare decode_step loop (no logits processors) via lax.fori_loop
  * cross-attention int8 kernel alone, 6 layers x 64 steps
  * logits matmul (tied embeddings) alone, 64 steps
  * logits processors (repetition penalty + no-repeat-ngram) alone

Timing discipline for the axon tunnel (docs/BENCHMARKS.md): block_until_ready
does not block; every timing forces a 1-element device->host read and
subtracts the measured RTT.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync_time(fn, *args, reps=5):
    """Median wall time of fn(*args) with a forced host read, minus RTT."""
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf.ravel()[0])          # warm-up + compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf.ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from multimodal_audio_search_tpu.config import DecodeConfig, MelConfig
    from multimodal_audio_search_tpu.models import whisper as W
    from multimodal_audio_search_tpu.models import layers as L
    from multimodal_audio_search_tpu.models.generate import (
        apply_repetition_penalty, ban_repeated_ngrams, generate)

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="base")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--fused-layer", action="store_true",
                    help="enable DecodeConfig.fused_layer (+fused MLP) "
                         "for every mode, and add the int8_fused mode "
                         "(the model-size-scaling lever set, "
                         "docs/BENCHMARKS.md)")
    args = ap.parse_args()

    platform = jax.devices()[0].platform
    B, STEPS = args.batch, 64
    cfg = W.PRESETS[args.preset]
    mel_cfg = MelConfig(padded_seconds=10.0)
    t_enc = int(mel_cfg.padded_seconds * 50)   # 500 enc positions
    dtype = jnp.bfloat16
    print(f"platform={platform} preset={args.preset} B={B} steps={STEPS} "
          f"t_enc={t_enc} fused_layer={args.fused_layer}")

    params = L.cast_floats(W.init_params(jax.random.PRNGKey(0), cfg), dtype)
    rng = np.random.default_rng(0)
    enc_out = jnp.asarray(
        rng.normal(size=(B, t_enc, cfg.d_model)), dtype)

    # RTT: host read of a tiny device array
    one = jnp.zeros((1,))
    rtt = sync_time(lambda x: x + 1, one)
    print(f"rtt_ms={rtt*1e3:.1f}")

    def report(name, t, per_step=None):
        ms = (t - rtt) * 1e3
        extra = f"  ({ms/per_step:.3f} ms/step)" if per_step else ""
        print(f"{name:44s} {ms:8.1f} ms{extra}")

    prefix = jnp.tile(jnp.asarray(W.forced_prefix(cfg), jnp.int32), (B, 1))
    plen = prefix.shape[1]

    from multimodal_audio_search_tpu.models.generate import _select_cross_kv
    modes = ("einsum", "fused", "int8")
    if args.fused_layer:
        modes = ("fused", "int8_fused")
    for mode in modes:
        dec_cfg = DecodeConfig(method="greedy", max_new_tokens=STEPS,
                               cross_attn=mode,
                               fused_layer=args.fused_layer)

        def full(params, enc_out, prefix):
            out = generate(params, enc_out, prefix, cfg=cfg, decode=dec_cfg,
                           prefix_len=plen, max_new_tokens=STEPS)
            return out.tokens
        t = sync_time(jax.jit(full), params, enc_out, prefix)
        report(f"full generate ({mode})", t, STEPS)

        # bare decode_step loop: no logits rules, no argmax bookkeeping
        @jax.jit
        def bare(params, enc_out):
            ckv = _select_cross_kv(params, enc_out, cfg, dec_cfg)
            cache = W.init_cache(cfg, B, plen + STEPS, dtype)
            tok = jnp.full((B,), cfg.bos_token_id, jnp.int32)

            def body(pos, carry):
                tok, cache, acc = carry
                logits, cache = W.decode_step(
                    params, tok, pos, cache, ckv, cfg)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (nxt, cache, acc + logits[:, 0])
            _, _, acc = jax.lax.fori_loop(
                0, STEPS, body, (tok, cache, jnp.zeros((B,), jnp.float32)))
            return acc
        t = sync_time(bare, params, enc_out)
        report(f"bare decode_step loop ({mode})", t, STEPS)

    # cross-attention alone: 6 layers x STEPS steps over quantized KV
    from multimodal_audio_search_tpu.ops.cached_attention import quantize_kv
    hd = cfg.d_model // cfg.heads
    k = jnp.asarray(rng.normal(size=(B, cfg.heads, t_enc, hd)), dtype)
    v = jnp.asarray(rng.normal(size=(B, cfg.heads, t_enc, hd)), dtype)
    q1 = jnp.asarray(rng.normal(size=(B, cfg.heads, hd)), dtype)

    @jax.jit
    def xattn_loop(q1, k, v):
        from multimodal_audio_search_tpu.ops.cached_attention import (
            int8_cached_attention)
        k8, ks, v8, vs = quantize_kv(k, v)

        def body(i, acc):
            o = int8_cached_attention(q1 + acc[:, :, :1] * 0, k8, ks, v8, vs)
            return acc + o
        acc = jax.lax.fori_loop(
            0, STEPS * cfg.dec_layers, body,
            jnp.zeros((B, cfg.heads, hd), jnp.float32))
        return acc
    t = sync_time(xattn_loop, q1, k, v)
    n = STEPS * cfg.dec_layers
    ms = (t - rtt) * 1e3
    traffic = B * cfg.heads * t_enc * hd * 2 * n / 1e9  # int8 K+V GB
    print(f"{'int8 cross-attn kernel x'+str(n):44s} {ms:8.1f} ms"
          f"  ({ms/STEPS:.3f} ms/step-equiv, {traffic/( (t-rtt)):.0f} GB/s)")

    # bf16 einsum cross-attn for comparison
    @jax.jit
    def xattn_bf16(q1, k, v):
        def body(i, acc):
            q = (q1 + acc[:, :, :1] * 0).astype(dtype)
            logits = jnp.einsum("bhd,bhtd->bht", q, k) / np.sqrt(hd)
            p = jax.nn.softmax(logits, axis=-1)
            return acc + jnp.einsum(
                "bht,bhtd->bhd", p.astype(dtype), v).astype(jnp.float32)
        return jax.lax.fori_loop(
            0, STEPS * cfg.dec_layers, body,
            jnp.zeros((B, cfg.heads, hd), jnp.float32))
    t = sync_time(xattn_bf16, q1, k, v)
    ms = (t - rtt) * 1e3
    traffic = B * cfg.heads * t_enc * hd * 4 * n / 1e9  # bf16 K+V GB
    print(f"{'bf16 einsum cross-attn x'+str(n):44s} {ms:8.1f} ms"
          f"  ({ms/STEPS:.3f} ms/step-equiv, {traffic/(t-rtt):.0f} GB/s)")

    # tied-logits matmul alone
    x1 = jnp.asarray(rng.normal(size=(B, cfg.d_model)), dtype)

    # NOTE the full-output reduction: consuming only a slice of the dot
    # lets XLA narrow the matmul to the consumed columns (slice-through-
    # dot), and a linear reduction (sum) lets it factor the reduction
    # into the weights — either way the loop stops measuring the matmul.
    # sum(lg*lg) survives both rewrites. (Round-2 lesson: the old slice
    # harness attributed 0.25 ms/step to this matmul; an end-to-end A/B
    # of three logits layouts showed the real cost is far smaller and
    # stock x @ E.T is already optimal.)
    @jax.jit
    def logits_loop(x1, emb):
        def body(i, acc):
            lg = jnp.dot((x1 + acc[:, :1] * 0), emb.T,
                         preferred_element_type=jnp.float32)
            return acc + jnp.sum(lg * lg, axis=-1, keepdims=True) * 1e-30
        return jax.lax.fori_loop(0, STEPS, body,
                                 jnp.zeros((B, 1), jnp.float32))
    t = sync_time(logits_loop, x1, params["decoder"]["embed_tokens"])
    ms = (t - rtt) * 1e3
    traffic = cfg.vocab_size * cfg.d_model * 2 * STEPS / 1e9
    print(f"{'tied logits matmul x'+str(STEPS):44s} {ms:8.1f} ms"
          f"  ({ms/STEPS:.3f} ms/step, {traffic/(t-rtt):.0f} GB/s)")

    # logits processors alone
    tokens = jnp.zeros((B, plen + STEPS), jnp.int32)
    lg = jnp.asarray(rng.normal(size=(B, cfg.vocab_size)), jnp.float32)

    @jax.jit
    def rules_loop(lg, tokens):
        def body(i, acc):
            l2 = apply_repetition_penalty(
                lg + acc * 0, tokens,
                jnp.arange(tokens.shape[1])[None, :] <= i, 1.05)
            l2 = ban_repeated_ngrams(l2, tokens, jnp.full((B,), i + 1), 2)
            return acc + l2
        return jax.lax.fori_loop(0, STEPS, body, jnp.zeros_like(lg))
    t = sync_time(rules_loop, lg, tokens)
    report(f"logits processors x{STEPS}", t, STEPS)

    # per-layer matmuls alone (qkvo + mlp, B rows)
    wq = params["decoder"]["blocks"][0]
    x1b = jnp.asarray(rng.normal(size=(B, 1, cfg.d_model)), dtype)

    @jax.jit
    def mats_loop(x1b):
        def body(i, x):
            h = x
            for name in ("q", "k", "v", "o"):
                h = L.dense(wq["self_attn"][name], h)
            h = L.dense(wq["mlp_out"], L.gelu(L.dense(wq["mlp_in"], h)))
            return x + h * 1e-6
        return jax.lax.fori_loop(0, STEPS * cfg.dec_layers, body, x1b)
    t = sync_time(mats_loop, x1b)
    report(f"qkvo+mlp matmuls x{STEPS*cfg.dec_layers}", t, STEPS)


if __name__ == "__main__":
    main()
