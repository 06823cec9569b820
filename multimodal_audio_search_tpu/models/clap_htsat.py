"""Weight-parity CLAP towers: HTSAT-Swin audio encoder + RoBERTa text encoder.

The reference's first iteration embedded audio and text directly with
laion/clap-htsat-unfused (previous_iterations/streamlit_app_backup.py:22-35,
598-638). Round 1 shipped the *capability* (models/clap.py, a trainable
MXU-shaped ViT tower); this module closes the weight-parity gap: the actual
laion architecture — a Swin transformer over a reshaped log-mel image and a
RoBERTa text encoder, each followed by a 2-layer MLP projection — as pure
functional JAX, convertible from any local HF ``ClapModel`` checkpoint and
numerically parity-tested against random-init torch (tests/test_clap_htsat.py).

TPU-native notes:
  * All Swin window machinery (relative-position index, shift masks, pad
    amounts) is static: computed in numpy at trace time, so the whole tower
    jits to fixed-shape MXU matmuls — no dynamic control flow.
  * The bicubic "mel -> 256x256 image" resize (torch ``interpolate`` with
    ``align_corners=True``) is expressed as two static interpolation-matrix
    matmuls, not a gather — MXU-friendly and exact.
  * Window partition/merge are reshapes+transposes (free under XLA layout
    assignment); attention over the 64-token windows is batched into one
    [B*nW, heads, 64, 64] einsum per block.

Weight-fusion (``enable_fusion=True`` checkpoints — the reference's
``laion/clap-htsat-fused`` dropdown option, streamlit_app_backup.py:22-35) is
supported: 4-channel fused inputs (downsampled-global + three crops), the
``mel_conv2d`` local patch conv, and the attentional-feature-fusion (AFF)
block, selected per row by ``is_longer``. The fusion select is a
``jnp.where`` over batch rows (both paths computed at static shape — the
TPU-native form of HF's index assignment, modeling_clap.py's
ClapAudioPatchEmbed.forward).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from . import layers as L


# --------------------------------------------------------------------- config
@dataclass(frozen=True)
class HTSATConfig:
    """Mirrors transformers.ClapAudioConfig (unfused) — defaults are laion's."""
    num_mel_bins: int = 64
    spec_size: int = 256
    patch_size: int = 4
    patch_stride: tuple = (4, 4)
    patch_embed_dim: int = 96          # patch_embeds_hidden_size
    depths: tuple = (2, 2, 6, 2)
    num_heads: tuple = (4, 8, 16, 32)
    window_size: int = 8
    mlp_ratio: float = 4.0
    hidden_size: int = 768             # = patch_embed_dim * 2**(n_stages-1)
    projection_dim: int = 512
    ln_eps: float = 1e-5
    bn_eps: float = 1e-5
    # laion/clap-htsat-fused: 4-channel inputs + AFF fusion in patch embed
    enable_fusion: bool = False
    aff_block_r: int = 4

    @property
    def freq_ratio(self) -> int:
        return self.spec_size // self.num_mel_bins

    @property
    def grid_size(self) -> tuple:
        return (self.spec_size // self.patch_stride[0],
                self.spec_size // self.patch_stride[1])


@dataclass(frozen=True)
class RobertaConfig:
    """Mirrors transformers.ClapTextConfig — defaults are laion's."""
    vocab_size: int = 50265
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_positions: int = 514
    type_vocab: int = 1
    pad_token_id: int = 1
    ln_eps: float = 1e-12
    projection_dim: int = 512


# ------------------------------------------------- static bicubic resize math
def _cubic_weights(t: np.ndarray, a: float = -0.75):
    """Cubic-convolution tap weights (torch's A=-0.75), t in [0,1)."""
    def k1(x):  # |x| <= 1
        return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0

    def k2(x):  # 1 < |x| < 2
        return ((a * x - 5.0 * a) * x + 8.0 * a) * x - 4.0 * a

    return np.stack([k2(t + 1.0), k1(t), k1(1.0 - t), k2(2.0 - t)], axis=-1)


@lru_cache(maxsize=16)
def bicubic_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] matrix reproducing torch bicubic, align_corners=True.

    Sample i reads source coordinate i*(n_in-1)/(n_out-1); 4 taps at
    floor-1..floor+2, edge-clamped. resize(x) == M @ x along that axis.
    """
    m = np.zeros((n_out, n_in), np.float64)
    scale = (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
    src = np.arange(n_out) * scale
    base = np.floor(src).astype(np.int64)
    w = _cubic_weights(src - base)                      # [n_out, 4]
    for tap in range(4):
        idx = np.clip(base + tap - 1, 0, n_in - 1)
        np.add.at(m, (np.arange(n_out), idx), w[:, tap])
    return m.astype(np.float32)


def reshape_mel2img(x: jnp.ndarray, cfg: HTSATConfig) -> jnp.ndarray:
    """[B, C, T, F] normalized log-mel -> [B, C, spec, spec] Swin image.

    Matches ClapAudioEncoder.reshape_mel2img (modeling_clap.py:824-858):
    bicubic align-corners stretch of time to spec_size*freq_ratio (and freq
    to spec_size/freq_ratio if short), then the freq_ratio fold of time
    chunks into the frequency axis.
    """
    fr = cfg.freq_ratio
    spec_w = cfg.spec_size * fr
    spec_h = cfg.spec_size // fr
    b, c, t, f = x.shape
    if t > spec_w or f > spec_h:
        raise ValueError(f"mel [{t},{f}] exceeds Swin input [{spec_w},{spec_h}]")
    if t < spec_w:
        mt = jnp.asarray(bicubic_matrix(t, spec_w), x.dtype)
        x = jnp.einsum("st,bctf->bcsf", mt, x)
        t = spec_w
    if f < spec_h:
        mf = jnp.asarray(bicubic_matrix(f, spec_h), x.dtype)
        x = jnp.einsum("sf,bctf->bcts", mf, x)
        f = spec_h
    x = x.reshape(b, c * fr, t // fr, f)
    x = x.transpose(0, 1, 3, 2)
    return x.reshape(b, c, f * fr, t // fr)


# ------------------------------------------------------- static Swin geometry
@lru_cache(maxsize=64)
def _relative_position_index(ws: int) -> np.ndarray:
    """[ws*ws, ws*ws] lookup into the (2ws-1)^2 relative-bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]       # [2, N, N]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return rel[..., 0] * (2 * ws - 1) + rel[..., 1]


@lru_cache(maxsize=64)
def _shift_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray | None:
    """Additive [nW, ws*ws, ws*ws] mask for shifted windows (-100 fill)."""
    if shift == 0:
        return None
    img = np.zeros((h, w), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for vs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, vs] = cnt
            cnt += 1
    win = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nW, ws*ws, C]"""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _window_reverse(x: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """[B*nW, ws*ws, C] -> [B, H, W, C]"""
    c = x.shape[-1]
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def _swin_block(params, x, hw, n_heads, ws, shift, cfg: HTSATConfig):
    """One Swin layer (modeling_clap.py:599-664): LN -> (shifted) window
    MSA with relative-position bias -> residual -> LN -> MLP -> residual."""
    h, w = hw
    if min(h, w) <= ws:                # window covers the map: no shift
        ws, shift = min(h, w), 0
    b, n, c = x.shape
    shortcut = x
    y = L.layer_norm(params["ln1"], x, cfg.ln_eps).reshape(b, h, w, c)

    pad_b = (ws - h % ws) % ws
    pad_r = (ws - w % ws) % ws
    if pad_b or pad_r:
        y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    hp, wp = h + pad_b, w + pad_r
    if shift:
        y = jnp.roll(y, (-shift, -shift), axis=(1, 2))

    win = _window_partition(y, ws)                     # [B*nW, N, C]
    nwin = win.shape[0] // b
    nq = ws * ws
    q = L.split_heads(L.dense(params["q"], win), n_heads)
    k = L.split_heads(L.dense(params["k"], win), n_heads)
    v = L.split_heads(L.dense(params["v"], win), n_heads)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits / math.sqrt(c // n_heads)
    bias_tab = params["rel_bias"].astype(jnp.float32)  # [(2ws-1)^2, nH]
    rel = bias_tab[jnp.asarray(_relative_position_index(ws)).reshape(-1)]
    logits = logits + rel.reshape(nq, nq, n_heads).transpose(2, 0, 1)[None]
    mask = _shift_mask(hp, wp, ws, shift)
    if mask is not None:
        logits = logits.reshape(b, nwin, n_heads, nq, nq) \
            + jnp.asarray(mask)[None, :, None]
        logits = logits.reshape(b * nwin, n_heads, nq, nq)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    ctx = L.merge_heads(jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                                   preferred_element_type=jnp.float32)
                        .astype(v.dtype))
    att = L.dense(params["o"], ctx)

    y = _window_reverse(att, ws, hp, wp)
    if shift:
        y = jnp.roll(y, (shift, shift), axis=(1, 2))
    if pad_b or pad_r:
        y = y[:, :h, :w]
    x = shortcut + y.reshape(b, n, c)

    hmid = L.layer_norm(params["ln2"], x, cfg.ln_eps)
    hmid = L.dense(params["mlp_out"], L.gelu(L.dense(params["mlp_in"], hmid)))
    return x + hmid


def _patch_merge(params, x, hw, cfg: HTSATConfig):
    """[B, H*W, C] -> [B, H/2*W/2, 2C] (modeling_clap.py:757-780)."""
    h, w = hw
    b, _, c = x.shape
    y = x.reshape(b, h, w, c)
    if h % 2 or w % 2:
        y = jnp.pad(y, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
    y = jnp.concatenate([y[:, 0::2, 0::2], y[:, 1::2, 0::2],
                         y[:, 0::2, 1::2], y[:, 1::2, 1::2]], axis=-1)
    y = y.reshape(b, -1, 4 * c)
    y = L.layer_norm(params["norm"], y, cfg.ln_eps)
    return L.dense(params["reduction"], y)


# -------------------------------------------- fusion (AFF) patch-embed path
def _conv1x1(p, x: jnp.ndarray) -> jnp.ndarray:
    """1x1 Conv2d as a channel matmul. x [B,C,H,W], w [O,C,1,1]."""
    y = jnp.einsum("oc,bchw->bohw", p["w"][:, :, 0, 0].astype(x.dtype), x,
                   preferred_element_type=jnp.float32)
    return (y + p["b"].astype(jnp.float32)[None, :, None, None]) \
        .astype(x.dtype)


def _bn2d(p, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Inference BatchNorm2d over the channel dim."""
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    y = (xf - p["mean"][None, :, None, None]) \
        * (inv * p["scale"])[None, :, None, None] \
        + p["bias"][None, :, None, None]
    return y.astype(x.dtype)


def _aff_fuse(p, hidden: jnp.ndarray, residual: jnp.ndarray,
              eps: float) -> jnp.ndarray:
    """ClapAudioAFFBlock: sigmoid-gated mix of global and local patches."""
    x = hidden + residual

    def att(branch, y):
        y = jax.nn.relu(_bn2d(branch["bn1"], _conv1x1(branch["conv1"], y),
                              eps))
        return _bn2d(branch["bn2"], _conv1x1(branch["conv2"], y), eps)

    gate = jax.nn.sigmoid(
        att(p["local"], x).astype(jnp.float32)
        + att(p["global"], jnp.mean(x, axis=(2, 3), keepdims=True))
        .astype(jnp.float32))
    return (2.0 * hidden.astype(jnp.float32) * gate
            + 2.0 * residual.astype(jnp.float32) * (1.0 - gate)) \
        .astype(hidden.dtype)


# ---------------------------------------------------------------- audio tower
def htsat_pooled(params, input_features: jnp.ndarray,
                 cfg: HTSATConfig = HTSATConfig(),
                 is_longer: jnp.ndarray | None = None) -> jnp.ndarray:
    """[B, C, T, F] log-mel -> [B, hidden_size] pooled HTSAT features.

    Matches ClapAudioEncoder.forward (modeling_clap.py:860-977): per-mel-bin
    eval BatchNorm, mel->image reshape, patch conv + LN, 4 Swin stages with
    patch merging, final LN, mean pool (the reference's permute + adaptive
    avg-pool over all 64 tokens is exactly a token mean).

    ``enable_fusion`` checkpoints take C=4 (global + 3 crops) and a
    per-row ``is_longer`` bool [B]: longer rows get the mel_conv2d local
    path fused into the global patches by the AFF block; short rows use
    the global channel alone (ClapAudioPatchEmbed.forward).
    """
    bn = params["batch_norm"]
    xf = input_features.astype(jnp.float32)
    inv = jax.lax.rsqrt(bn["var"].astype(jnp.float32) + cfg.bn_eps)
    x = (xf - bn["mean"]) * inv * bn["scale"] + bn["bias"]
    x = x.astype(input_features.dtype)

    x = reshape_mel2img(x, cfg)                        # [B, C, S, S]

    pe = params["patch_embed"]
    ps = (cfg.patch_size, cfg.patch_size)
    pad = ((ps[0] - cfg.patch_stride[0]) // 2,
           (ps[1] - cfg.patch_stride[1]) // 2)
    glob = x[:, 0:1] if cfg.enable_fusion else x
    y = jax.lax.conv_general_dilated(
        glob, pe["w"].astype(x.dtype),
        window_strides=cfg.patch_stride,
        padding=((pad[0], pad[0]), (pad[1], pad[1])),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    y = y + pe["b"].astype(x.dtype)[None, :, None, None]
    if cfg.enable_fusion and is_longer is not None:
        f = pe["fusion"]
        bsz, nch, s1, s2 = x.shape
        loc = x[:, 1:].reshape(bsz * (nch - 1), 1, s1, s2)
        loc = jax.lax.conv_general_dilated(
            loc, f["mel_conv2d"]["w"].astype(x.dtype),
            window_strides=(cfg.patch_stride[0], cfg.patch_stride[1] * 3),
            padding=((pad[0], pad[0]), (pad[1], pad[1])),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32).astype(x.dtype)
        loc = loc + f["mel_conv2d"]["b"].astype(x.dtype)[None, :, None,
                                                         None]
        _, cc, lh, lw = loc.shape
        loc = loc.reshape(bsz, nch - 1, cc, lh, lw) \
            .transpose(0, 2, 3, 1, 4).reshape(bsz, cc, lh, (nch - 1) * lw)
        loc = jnp.pad(
            loc, ((0, 0), (0, 0), (0, 0),
                  (0, y.shape[-1] - (nch - 1) * lw)))
        fused = _aff_fuse(f, y, loc, cfg.bn_eps)
        y = jnp.where(
            jnp.asarray(is_longer).reshape(-1, 1, 1, 1), fused, y)
    x = y
    b, c, gh, gw = x.shape
    x = x.reshape(b, c, gh * gw).transpose(0, 2, 1)    # [B, N, C]
    x = L.layer_norm(pe["norm"], x, cfg.ln_eps)

    hw = cfg.grid_size
    for si, stage in enumerate(params["stages"]):
        for bi, blk in enumerate(stage["blocks"]):
            shift = 0 if bi % 2 == 0 else cfg.window_size // 2
            x = _swin_block(blk, x, hw, cfg.num_heads[si],
                            cfg.window_size, shift, cfg)
        if stage.get("downsample") is not None:
            x = _patch_merge(stage["downsample"], x, hw, cfg)
            hw = ((hw[0] + 1) // 2, (hw[1] + 1) // 2)

    x = L.layer_norm(params["norm"], x, cfg.ln_eps)
    return jnp.mean(x.astype(jnp.float32), axis=1)     # [B, hidden]


def projection(params, x: jnp.ndarray) -> jnp.ndarray:
    """ClapProjectionLayer (modeling_clap.py:980-995): linear-ReLU-linear."""
    return L.dense(params["linear2"],
                   jax.nn.relu(L.dense(params["linear1"], x)))


def audio_embed(params, input_features: jnp.ndarray,
                cfg: HTSATConfig = HTSATConfig(),
                is_longer: jnp.ndarray | None = None) -> jnp.ndarray:
    """ClapModel.get_audio_features: pooled -> projection -> L2 norm."""
    z = projection(params["proj"],
                   htsat_pooled(params, input_features, cfg, is_longer))
    z = z.astype(jnp.float32)
    return z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)


# ----------------------------------------------------------------- text tower
def roberta_positions(input_ids: jnp.ndarray, mask: jnp.ndarray,
                      pad_id: int) -> jnp.ndarray:
    """RoBERTa position ids: pad-aware cumsum offset by padding_idx
    (modeling_clap.py create_position_ids_from_input_ids)."""
    m = mask.astype(jnp.int32)
    return jnp.cumsum(m, axis=1) * m + pad_id


def roberta_pooled(params, input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
                   cfg: RobertaConfig = RobertaConfig()) -> jnp.ndarray:
    """[B, T] -> [B, hidden] tanh-pooled CLS (ClapTextModel + pooler)."""
    emb = params["embeddings"]
    pos = roberta_positions(input_ids, attention_mask, cfg.pad_token_id)
    x = emb["word"][input_ids] + emb["position"][pos] \
        + emb["token_type"][0][None, None]
    x = L.layer_norm(emb["ln"], x, cfg.ln_eps)
    bias = L.padding_bias(attention_mask)
    for blk in params["blocks"]:
        a = L.mha(blk["attn"], x, x, cfg.heads, bias)
        x = L.layer_norm(blk["attn_ln"], x + a, cfg.ln_eps)
        h = L.dense(blk["mlp_out"], L.gelu(L.dense(blk["mlp_in"], x)))
        x = L.layer_norm(blk["mlp_ln"], x + h, cfg.ln_eps)
    return jnp.tanh(L.dense(params["pooler"], x[:, 0]).astype(jnp.float32))


def text_embed(params, input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
               cfg: RobertaConfig = RobertaConfig()) -> jnp.ndarray:
    """ClapModel.get_text_features: pooled -> projection -> L2 norm."""
    z = projection(params["proj"],
                   roberta_pooled(params, input_ids, attention_mask, cfg))
    z = z.astype(jnp.float32)
    return z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)


# -------------------------------------------------------------- random init
def init_audio_params(key, cfg: HTSATConfig = HTSATConfig()) -> dict:
    ks = iter(jax.random.split(
        key, 8 + 8 * sum(cfg.depths) + len(cfg.depths)
        + (8 if cfg.enable_fusion else 0)))
    params: dict = {
        "batch_norm": {
            "mean": jnp.zeros((cfg.num_mel_bins,), jnp.float32),
            "var": jnp.ones((cfg.num_mel_bins,), jnp.float32),
            "scale": jnp.ones((cfg.num_mel_bins,), jnp.float32),
            "bias": jnp.zeros((cfg.num_mel_bins,), jnp.float32),
        },
        "patch_embed": {
            "w": jax.random.normal(
                next(ks), (cfg.patch_embed_dim, 1, cfg.patch_size,
                           cfg.patch_size), jnp.float32) * 0.02,
            "b": jnp.zeros((cfg.patch_embed_dim,), jnp.float32),
            "norm": L.init_layer_norm(cfg.patch_embed_dim),
        },
        "norm": L.init_layer_norm(cfg.hidden_size),
        "proj": {
            "linear1": L.init_dense(next(ks), cfg.hidden_size,
                                    cfg.projection_dim),
            "linear2": L.init_dense(next(ks), cfg.projection_dim,
                                    cfg.projection_dim),
        },
        "stages": [],
    }
    if cfg.enable_fusion:
        inter = cfg.patch_embed_dim // cfg.aff_block_r

        def bn_init(c):
            return {"mean": jnp.zeros((c,), jnp.float32),
                    "var": jnp.ones((c,), jnp.float32),
                    "scale": jnp.ones((c,), jnp.float32),
                    "bias": jnp.zeros((c,), jnp.float32)}

        def conv1x1_init(cin, cout):
            return {"w": jax.random.normal(
                next(ks), (cout, cin, 1, 1), jnp.float32) * 0.02,
                "b": jnp.zeros((cout,), jnp.float32)}

        def att_init():
            return {"conv1": conv1x1_init(cfg.patch_embed_dim, inter),
                    "bn1": bn_init(inter),
                    "conv2": conv1x1_init(inter, cfg.patch_embed_dim),
                    "bn2": bn_init(cfg.patch_embed_dim)}

        params["patch_embed"]["fusion"] = {
            "mel_conv2d": {
                "w": jax.random.normal(
                    next(ks), (cfg.patch_embed_dim, 1, cfg.patch_size,
                               cfg.patch_size * 3), jnp.float32) * 0.02,
                "b": jnp.zeros((cfg.patch_embed_dim,), jnp.float32)},
            "local": att_init(),
            "global": att_init(),
        }
    n_stages = len(cfg.depths)
    for si in range(n_stages):
        dim = cfg.patch_embed_dim * (2 ** si)
        inter = int(cfg.mlp_ratio * dim)
        blocks = []
        for _ in range(cfg.depths[si]):
            blocks.append({
                "q": L.init_dense(next(ks), dim, dim),
                "k": L.init_dense(next(ks), dim, dim),
                "v": L.init_dense(next(ks), dim, dim),
                "o": L.init_dense(next(ks), dim, dim),
                "rel_bias": jax.random.normal(
                    next(ks), ((2 * cfg.window_size - 1) ** 2,
                               cfg.num_heads[si]), jnp.float32) * 0.02,
                "ln1": L.init_layer_norm(dim),
                "ln2": L.init_layer_norm(dim),
                "mlp_in": L.init_dense(next(ks), dim, inter),
                "mlp_out": L.init_dense(next(ks), inter, dim),
            })
        stage = {"blocks": blocks, "downsample": None}
        if si < n_stages - 1:
            stage["downsample"] = {
                "norm": L.init_layer_norm(4 * dim),
                "reduction": L.init_dense(next(ks), 4 * dim, 2 * dim,
                                          bias=False),
            }
        params["stages"].append(stage)
    return params


def init_text_params(key, cfg: RobertaConfig = RobertaConfig()) -> dict:
    ks = iter(jax.random.split(key, cfg.layers + 8))
    params = {
        "embeddings": {
            "word": jax.random.normal(
                next(ks), (cfg.vocab_size, cfg.hidden), jnp.float32) * 0.02,
            "position": jax.random.normal(
                next(ks), (cfg.max_positions, cfg.hidden),
                jnp.float32) * 0.02,
            "token_type": jax.random.normal(
                next(ks), (cfg.type_vocab, cfg.hidden), jnp.float32) * 0.02,
            "ln": L.init_layer_norm(cfg.hidden),
        },
        "blocks": [],
        "pooler": L.init_dense(next(ks), cfg.hidden, cfg.hidden),
        "proj": {
            "linear1": L.init_dense(next(ks), cfg.hidden, cfg.projection_dim),
            "linear2": L.init_dense(next(ks), cfg.projection_dim,
                                    cfg.projection_dim),
        },
    }
    for _ in range(cfg.layers):
        k = next(ks)
        k1, k2, k3 = jax.random.split(k, 3)
        params["blocks"].append({
            "attn": L.init_mha(k1, cfg.hidden),
            "attn_ln": L.init_layer_norm(cfg.hidden),
            "mlp_in": L.init_dense(k2, cfg.hidden, cfg.intermediate),
            "mlp_out": L.init_dense(k3, cfg.intermediate, cfg.hidden),
            "mlp_ln": L.init_layer_norm(cfg.hidden),
        })
    return params


# ------------------------------------------------------------------- convert
def _np(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy().astype(np.float32)
    except AttributeError:
        return np.asarray(t, np.float32)


def _lin(sd, prefix, bias=True):
    p = {"w": _np(sd[f"{prefix}.weight"]).T}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = _np(sd[f"{prefix}.bias"])
    return p


def _ln(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def htsat_config_from_hf(hf_cfg) -> HTSATConfig:
    stride = hf_cfg.patch_stride
    stride = tuple(stride) if not isinstance(stride, int) \
        else (stride, stride)
    return HTSATConfig(
        num_mel_bins=hf_cfg.num_mel_bins, spec_size=hf_cfg.spec_size,
        patch_size=hf_cfg.patch_size, patch_stride=stride,
        patch_embed_dim=hf_cfg.patch_embeds_hidden_size,
        depths=tuple(hf_cfg.depths),
        num_heads=tuple(hf_cfg.num_attention_heads),
        window_size=hf_cfg.window_size, mlp_ratio=hf_cfg.mlp_ratio,
        hidden_size=hf_cfg.hidden_size,
        projection_dim=hf_cfg.projection_dim,
        ln_eps=hf_cfg.layer_norm_eps,
        enable_fusion=bool(getattr(hf_cfg, "enable_fusion", False)),
        aff_block_r=int(getattr(hf_cfg, "aff_block_r", 4)))


def roberta_config_from_hf(hf_cfg) -> RobertaConfig:
    return RobertaConfig(
        vocab_size=hf_cfg.vocab_size, hidden=hf_cfg.hidden_size,
        layers=hf_cfg.num_hidden_layers, heads=hf_cfg.num_attention_heads,
        intermediate=hf_cfg.intermediate_size,
        max_positions=hf_cfg.max_position_embeddings,
        type_vocab=hf_cfg.type_vocab_size, pad_token_id=hf_cfg.pad_token_id,
        ln_eps=hf_cfg.layer_norm_eps,
        projection_dim=hf_cfg.projection_dim)


def convert_clap_audio(state_dict: Mapping[str, Any],
                       cfg: HTSATConfig) -> dict:
    """ClapModel / ClapAudioModelWithProjection state_dict -> audio pytree."""
    sd = dict(state_dict)
    has_fusion = any(".fusion_model." in k or ".mel_conv2d." in k
                     for k in sd)
    if has_fusion and not cfg.enable_fusion:
        raise ValueError(
            "this is an enable_fusion checkpoint (laion/clap-htsat-fused);"
            " pass an HTSATConfig(enable_fusion=True)")
    if cfg.enable_fusion and not has_fusion:
        raise ValueError(
            "enable_fusion=True but the state_dict has no fusion weights "
            "(is this laion/clap-htsat-unfused?)")
    enc = "audio_model.audio_encoder"
    params = {
        "batch_norm": {
            "mean": _np(sd[f"{enc}.batch_norm.running_mean"]),
            "var": _np(sd[f"{enc}.batch_norm.running_var"]),
            "scale": _np(sd[f"{enc}.batch_norm.weight"]),
            "bias": _np(sd[f"{enc}.batch_norm.bias"]),
        },
        "patch_embed": {
            "w": _np(sd[f"{enc}.patch_embed.proj.weight"]),   # OIHW as-is
            "b": _np(sd[f"{enc}.patch_embed.proj.bias"]),
            "norm": _ln(sd, f"{enc}.patch_embed.norm"),
        },
        "norm": _ln(sd, f"{enc}.norm"),
        "proj": {
            "linear1": _lin(sd, "audio_projection.linear1"),
            "linear2": _lin(sd, "audio_projection.linear2"),
        },
        "stages": [],
    }
    if cfg.enable_fusion:
        pe = f"{enc}.patch_embed"

        def conv(prefix):
            return {"w": _np(sd[f"{prefix}.weight"]),
                    "b": _np(sd[f"{prefix}.bias"])}

        def bn(prefix):
            return {"mean": _np(sd[f"{prefix}.running_mean"]),
                    "var": _np(sd[f"{prefix}.running_var"]),
                    "scale": _np(sd[f"{prefix}.weight"]),
                    "bias": _np(sd[f"{prefix}.bias"])}

        # Sequential indices (modeling_clap.py ClapAudioAFFBlock):
        # local_att = [Conv, BN, ReLU, Conv, BN]; global_att has an
        # AdaptiveAvgPool2d at slot 0, shifting everything by one
        params["patch_embed"]["fusion"] = {
            "mel_conv2d": conv(f"{pe}.mel_conv2d"),
            "local": {
                "conv1": conv(f"{pe}.fusion_model.local_att.0"),
                "bn1": bn(f"{pe}.fusion_model.local_att.1"),
                "conv2": conv(f"{pe}.fusion_model.local_att.3"),
                "bn2": bn(f"{pe}.fusion_model.local_att.4")},
            "global": {
                "conv1": conv(f"{pe}.fusion_model.global_att.1"),
                "bn1": bn(f"{pe}.fusion_model.global_att.2"),
                "conv2": conv(f"{pe}.fusion_model.global_att.4"),
                "bn2": bn(f"{pe}.fusion_model.global_att.5")},
        }
    for si in range(len(cfg.depths)):
        st = f"{enc}.layers.{si}"
        blocks = []
        for bi in range(cfg.depths[si]):
            b = f"{st}.blocks.{bi}"
            blocks.append({
                "q": _lin(sd, f"{b}.attention.self.query"),
                "k": _lin(sd, f"{b}.attention.self.key"),
                "v": _lin(sd, f"{b}.attention.self.value"),
                "o": _lin(sd, f"{b}.attention.output.dense"),
                "rel_bias": _np(
                    sd[f"{b}.attention.self.relative_position_bias_table"]),
                "ln1": _ln(sd, f"{b}.layernorm_before"),
                "ln2": _ln(sd, f"{b}.layernorm_after"),
                "mlp_in": _lin(sd, f"{b}.intermediate.dense"),
                "mlp_out": _lin(sd, f"{b}.output.dense"),
            })
        stage = {"blocks": blocks, "downsample": None}
        if f"{st}.downsample.reduction.weight" in sd:
            stage["downsample"] = {
                "norm": _ln(sd, f"{st}.downsample.norm"),
                "reduction": _lin(sd, f"{st}.downsample.reduction",
                                  bias=False),
            }
        params["stages"].append(stage)
    return params


def convert_clap_text(state_dict: Mapping[str, Any],
                      cfg: RobertaConfig) -> dict:
    """ClapModel / ClapTextModelWithProjection state_dict -> text pytree."""
    sd = dict(state_dict)
    tm = "text_model"
    e = f"{tm}.embeddings"
    params = {
        "embeddings": {
            "word": _np(sd[f"{e}.word_embeddings.weight"]),
            "position": _np(sd[f"{e}.position_embeddings.weight"]),
            "token_type": _np(sd[f"{e}.token_type_embeddings.weight"]),
            "ln": _ln(sd, f"{e}.LayerNorm"),
        },
        "blocks": [],
        "pooler": _lin(sd, f"{tm}.pooler.dense"),
        "proj": {
            "linear1": _lin(sd, "text_projection.linear1"),
            "linear2": _lin(sd, "text_projection.linear2"),
        },
    }
    for i in range(cfg.layers):
        b = f"{tm}.encoder.layer.{i}"
        params["blocks"].append({
            "attn": {
                "q": _lin(sd, f"{b}.attention.self.query"),
                "k": _lin(sd, f"{b}.attention.self.key"),
                "v": _lin(sd, f"{b}.attention.self.value"),
                "o": _lin(sd, f"{b}.attention.output.dense"),
            },
            "attn_ln": _ln(sd, f"{b}.attention.output.LayerNorm"),
            "mlp_in": _lin(sd, f"{b}.intermediate.dense"),
            "mlp_out": _lin(sd, f"{b}.output.dense"),
            "mlp_ln": _ln(sd, f"{b}.output.LayerNorm"),
        })
    return params


def load_from_dir(path: str):
    """Local ClapModel checkpoint dir -> (audio_params, text_params,
    HTSATConfig, RobertaConfig). Reads config.json directly (no transformers
    import needed at serve time); weights via convert.load_state_dict_from_dir.
    """
    import json
    import pathlib

    from .convert import load_state_dict_from_dir

    raw = json.loads((pathlib.Path(path) / "config.json").read_text())
    ac, tc = raw["audio_config"], raw["text_config"]

    class _NS:
        def __init__(self, d, defaults):
            self.__dict__.update({**defaults, **d})

    audio_defaults = dict(
        num_mel_bins=64, spec_size=256, patch_size=4, patch_stride=[4, 4],
        patch_embeds_hidden_size=96, depths=[2, 2, 6, 2],
        num_attention_heads=[4, 8, 16, 32], window_size=8, mlp_ratio=4.0,
        hidden_size=768, projection_dim=raw.get("projection_dim", 512),
        layer_norm_eps=1e-5)
    text_defaults = dict(
        vocab_size=50265, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=514, type_vocab_size=1, pad_token_id=1,
        layer_norm_eps=1e-12, projection_dim=raw.get("projection_dim", 512))
    acfg = htsat_config_from_hf(_NS(ac, audio_defaults))
    tcfg = roberta_config_from_hf(_NS(tc, text_defaults))
    sd = load_state_dict_from_dir(path)
    return (convert_clap_audio(sd, acfg), convert_clap_text(sd, tcfg),
            acfg, tcfg)
