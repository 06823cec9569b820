#!/usr/bin/env bash
# One-command environment setup (the reference ships setup_unix.sh with a
# venv + pip + launch flow; this is the TPU-native equivalent).
#
#   ./scripts/setup_unix.sh            # create .venv, install, self-check
#   ./scripts/setup_unix.sh --tpu      # also install the libtpu jax extra
set -euo pipefail
cd "$(dirname "$0")/.."

PY=${PYTHON:-python3}
if [ ! -d .venv ]; then
    echo "creating virtualenv (.venv)"
    "$PY" -m venv .venv
fi
# shellcheck disable=SC1091
source .venv/bin/activate

if [ "${1:-}" = "--tpu" ]; then
    pip install -U "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
fi
pip install -e ".[convert,monitor,test]"

echo "self-check: import + one jitted search"
python - <<'EOF'
import numpy as np
from multimodal_audio_search_tpu.index.store import SegmentStore
from multimodal_audio_search_tpu.index.fusion import fused_topk
import jax.numpy as jnp
emb = np.random.default_rng(0).normal(size=(128, 2, 384)).astype(np.float32)
emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
out = fused_topk(jnp.asarray(emb[0, 0]), jnp.asarray(emb),
                 jnp.ones((128, 2), bool), jnp.float32(.5), jnp.float32(.5))
assert int(out["indices"][0]) == 0
print("ok — run ./scripts/serve.sh to start the server on :8527")
EOF
