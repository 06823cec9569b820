"""REAL multi-process DCN validation on one host (SURVEY §5 distributed
backend; ROADMAP 19's closest hardware-free approximation).

The virtual-device dryrun (``__graft_entry__.dryrun_multichip``) proves the
3-axis mesh compiles and its collectives are semantically right — but inside
ONE process, where "DCN" is a reshape. This tool spawns N actual OS
processes, each owning its own XLA CPU client with M virtual devices, wires
them through ``jax.distributed.initialize`` (localhost coordinator, the same
gRPC coordination service a real multi-host TPU pod uses), and runs:

  * ``parallel.distributed.make_dcn_mesh`` — which now takes the
    ``create_hybrid_device_mesh`` branch, exactly as on a real pod, because
    ``jax.process_count() > 1`` for real;
  * ``hierarchical_sharded_topk`` over an index sharded across processes
    (stage-2 all-gather really crosses process boundaries over gRPC);
  * one data-parallel train step with ``P(("dcn","data"))`` batch sharding,
    gradients psum'd across processes.

Every process asserts the replicated outputs equal a locally computed
single-device oracle, then prints MPDCN_OK. Run with no args; exit 0 means
all processes agreed.

Usage:  python tools/multiprocess_dcn_check.py [--procs 2] [--local 4]
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(procs: int, local: int, port: int) -> None:
    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")
    pid = int(os.environ["MPDCN_PROC"])
    sys.path.insert(0, REPO)
    from multimodal_audio_search_tpu.parallel import distributed as D

    assert D.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=procs, process_id=pid)
    assert jax.process_count() == procs, jax.process_count()
    assert len(jax.devices()) == procs * local, len(jax.devices())

    mesh = D.make_dcn_mesh(dcn=procs, model_parallel=1)
    assert mesh.shape == {"dcn": procs, "data": local, "model": 1}

    # --- hierarchical sharded search across real process boundaries ---
    n, d, k = 512, 64, 10
    rng = np.random.default_rng(7)
    emb = rng.normal(size=(n, 2, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    success = (rng.random((n, 2)) > 0.2).astype(np.float32)
    query = rng.normal(size=(d,)).astype(np.float32)
    query /= np.linalg.norm(query)
    w_asr, w_audio = np.float32(0.6), np.float32(0.4)

    sharding = D.dcn_data_sharded(mesh)
    emb_g = jax.make_array_from_callback(
        emb.shape, sharding, lambda idx: emb[idx])
    suc_g = jax.make_array_from_callback(
        success.shape, sharding, lambda idx: success[idx])

    fn = D.hierarchical_sharded_topk(mesh, k=k)
    s, i = fn(query, emb_g, suc_g, w_asr, w_audio)
    s = np.asarray(jax.device_get(s))
    i = np.asarray(jax.device_get(i))

    # single-device oracle (same math as index.fusion.fused_scores)
    from multimodal_audio_search_tpu.index.fusion import fused_scores
    masked, _ = fused_scores(query, emb, success, w_asr, w_audio, 0.1)
    masked = np.asarray(masked)
    oi = np.argsort(-masked, kind="stable")[:k]
    np.testing.assert_allclose(s, masked[oi], rtol=1e-5, atol=1e-6)
    # scores strictly decreasing here (continuous random): indices match too
    np.testing.assert_array_equal(np.sort(i), np.sort(oi))

    # --- one DP train step whose grad psum crosses processes ---
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    w = jnp.zeros((d,), jnp.float32)
    xb = rng.normal(size=(procs * local * 4, d)).astype(np.float32)
    yb = xb @ rng.normal(size=(d,)).astype(np.float32)
    bsh = NamedSharding(mesh, P(("dcn", "data")))
    xg = jax.make_array_from_callback(xb.shape, bsh, lambda idx: xb[idx])
    yg = jax.make_array_from_callback(yb.shape, bsh, lambda idx: yb[idx])

    def loss(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    step = jax.jit(jax.grad(loss),
                   in_shardings=(NamedSharding(mesh, P()), bsh, bsh),
                   out_shardings=NamedSharding(mesh, P()))
    g = np.asarray(jax.device_get(step(w, xg, yg)))
    g_ref = np.asarray(jax.grad(
        lambda w: float(0) + jnp.mean((jnp.asarray(xb) @ w
                                       - jnp.asarray(yb)) ** 2))(w))
    np.testing.assert_allclose(g, g_ref, rtol=2e-5, atol=1e-6)

    print(f"MPDCN_OK pid={pid} top1={s[0]:.4f} gnorm={np.linalg.norm(g):.4f}",
          flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--local", type=int, default=4)
    ap.add_argument("--port", type=int, default=19733)
    args = ap.parse_args()

    if "MPDCN_PROC" in os.environ:
        child(args.procs, args.local, args.port)
        return 0

    env_base = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={args.local}",
    }
    procs = []
    for pid in range(args.procs):
        env = {**env_base, "MPDCN_PROC": str(pid)}
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--procs", str(args.procs), "--local", str(args.local),
             "--port", str(args.port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    ok = True
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        if p.returncode != 0 or "MPDCN_OK" not in out:
            ok = False
            print(f"--- process {pid} FAILED (rc={p.returncode}):")
        print(out.strip())
    print("ALL OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
