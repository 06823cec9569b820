"""Machine-extract the Layer III synthesis window from libmpg123.

The polyphase synthesis filterbank's 512-tap window D (ISO 11172-3 Table
B.3) has no closed form. Everything AROUND it does: requantization (value 1
at global_gain 210 is exactly 1.0), the 36-point IMDCT and its sine window,
frequency inversion, and the DCT-32 matrixing are all analytic. So for a
single spectral impulse injected with a crafted frame (tools/mp3_frames.py),
every PCM sample is LINEAR in D with computable coefficients:

    PCM[32 t + q] = sum_i D[q + 32 i] * U_t[q + 32 i]

where U_t comes from running the V-FIFO on the impulse's analytic subband
signal. 64 impulses (lines 8 and 9 of each subband — mid-subband, so the
antialias butterflies never touch them) give 4608 equations per lane q for
16 unknowns; the least-squares residual doubles as a proof that ALL the
analytic conventions match the real decoder (a wrong IMDCT offset or
inversion rule blows the residual up by orders of magnitude).

Emits native/mp3_synth_window.inc + a residual report into
tools/mp3_tables.json (extending the Huffman provenance).

Depends on tools/mp3_tables.json (for table 15's (0,0)/(1,0)/(0,1) codes).
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mp3_frames import GranuleSpec, probe_stream  # noqa: E402

from multimodal_audio_search_tpu.audio.mp3 import decode_mp3  # noqa: E402

FRAME = 1152
WIN = 2304


def impulse_bits(books: dict, line: int, sign: int = 1):
    """Main-data bits + big_values placing value +-1 at spectral `line`."""
    b15 = books["15"]
    c00 = next(c for c, v in b15.items() if v == [0, 0])
    c10 = next(c for c, v in b15.items() if v == [1, 0])
    c01 = next(c for c, v in b15.items() if v == [0, 1])
    pairs = line // 2
    sbit = "0" if sign > 0 else "1"
    bits = c00 * pairs + (c10 if line % 2 == 0 else c01) + sbit
    return bits, pairs + 1


def measure_impulses(books: dict, lines: list[int]) -> np.ndarray:
    specs = []
    for ln in lines:
        bits, bv = impulse_bits(books, ln)
        specs.append(GranuleSpec(
            data_bits=bits, big_values=bv, table_select=(15, 15, 15),
            region0_count=15, region1_count=7, part2_3_length=len(bits)))
    pcm, _ = decode_mp3(probe_stream(specs))
    out = np.empty((len(specs), WIN), np.float32)
    for i in range(len(specs)):
        s = FRAME * (1 + 2 * i)
        out[i] = pcm[s:s + WIN]
    return out


def subband_signal(line: int) -> np.ndarray:
    """Analytic 36-slot subband-sample signal of a +1 impulse at `line`
    (long block, granule 0 of a frame; granule 1 silent): IMDCT -> sine
    window -> frequency inversion. [36, 32] (slot, subband)."""
    b, m = divmod(line, 18)
    p = np.arange(36)
    z = np.cos(np.pi / 72 * (2 * p + 1 + 18) * (2 * m + 1))
    w = np.sin(np.pi / 36 * (p + 0.5))
    zw = z * w
    sig = np.zeros((36, 32))
    sig[:, b] = zw                       # granule 0 slots 0-17, overlap 18-35
    if b % 2 == 1:                       # frequency inversion: odd subband,
        sig[1::2, b] *= -1.0             # odd slot index within the granule
    return sig


def u_coefficients(sig: np.ndarray) -> np.ndarray:
    """Run the V-FIFO on [T, 32] subband samples -> U coefficients
    [T, 512] such that PCM[32t+q] = sum_i D[q+32i] * U[t, q+32i]."""
    T = sig.shape[0]
    i64 = np.arange(64)
    k32 = np.arange(32)
    N = np.cos((16 + i64)[:, None] * (2 * k32[None, :] + 1) * np.pi / 64)
    V = np.zeros(1024)
    U = np.zeros((T, 512))
    for t in range(T):
        V[64:] = V[:-64].copy()
        V[:64] = N @ sig[t]
        for i in range(8):
            U[t, i * 64:i * 64 + 32] = V[i * 128:i * 128 + 32]
            U[t, i * 64 + 32:i * 64 + 64] = V[i * 128 + 96:i * 128 + 128]
    return U


def solve_window(M: np.ndarray, lines: list[int]):
    """Per-lane least squares for D[512]; returns (D, relative residual)."""
    n_probes = len(lines)
    T = 72                                # 2 frames of slots per window
    A = np.zeros((n_probes, T, 512))
    for i, ln in enumerate(lines):
        sig = np.zeros((T, 32))
        sig[:36] = subband_signal(ln)     # frame 2 (the probe frame)...
        A[i] = u_coefficients(sig)
    # probe window starts at the probe frame; slots 0..71 map to PCM
    # samples 32t+q of M[i]
    D = np.zeros(512)
    num = 0.0
    den = 0.0
    for q in range(32):
        rows = []
        rhs = []
        for i in range(n_probes):
            for t in range(T):
                rows.append(A[i, t, q::32])          # D[q+32k] coeffs
                rhs.append(M[i, 32 * t + q])
        rows = np.asarray(rows)
        rhs = np.asarray(rhs)
        sol, res, *_ = np.linalg.lstsq(rows, rhs, rcond=None)
        D[q::32] = sol
        pred = rows @ sol
        num += float(np.sum((pred - rhs) ** 2))
        den += float(np.sum(rhs ** 2))
    return D, float(np.sqrt(num / max(den, 1e-30)))


def main(out_inc="native/mp3_synth_window.inc",
         tables_json="tools/mp3_tables.json"):
    prov = json.loads(Path(tables_json).read_text())
    books = prov["books"]
    lines = [18 * b + o for b in range(32) for o in (8, 9)]
    print(f"measuring {len(lines)} impulse responses ...")
    M = measure_impulses(books, lines)
    # FIFO warmup: the leading silent frame leaves V zero — probe frame
    # starts with clean state. Solve.
    D, rel = solve_window(M, lines)
    print(f"relative residual: {rel:.3e}")
    assert rel < 1e-4, (
        "analytic model does not match the decoder; check IMDCT/inversion "
        f"conventions (residual {rel})")
    lines_txt = [
        "// GENERATED by tools/probe_mp3_synth.py — do not edit.",
        "// Layer III polyphase synthesis window, least-squares extracted",
        "// from libmpg123 impulse responses through the analytic",
        f"// IMDCT/matrixing model (relative residual {rel:.2e}).",
        "#pragma once",
        "static const double mas_synth_window[512] = {",
    ]
    for i in range(0, 512, 4):
        lines_txt.append("  " + ", ".join(f"{v:+.17e}" for v in D[i:i + 4])
                         + ",")
    lines_txt.append("};")
    Path(out_inc).write_text("\n".join(lines_txt) + "\n")
    prov["synth_window"] = {"relative_residual": rel,
                            "n_impulses": len(lines)}
    Path(tables_json).write_text(json.dumps(prov, indent=1))
    print(f"wrote {out_inc}")


if __name__ == "__main__":
    main(*sys.argv[1:])
