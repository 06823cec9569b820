"""TPU-native multimodal audio search framework.

A ground-up JAX/XLA/Pallas rebuild of ClipABit's dual-pipeline audio search
(reference: /root/reference/audio_search.py): 10 s segmentation, Whisper ASR
+ Whisper-tiny audio captioning, unified MiniLM 384D embedding space, and
keyword-weighted cosine fusion search — implemented as batched XLA programs
with KV-cached on-device decoding and a fused batched top-k search kernel.

Public surface (BASELINE.json contract):

    from multimodal_audio_search_tpu import AudioSearchEngine
    engine = AudioSearchEngine()
    segments = engine.ingest("clip.wav")
    hits, weights = engine.search("upbeat music with drums", k=10)
"""

from .config import EngineConfig, default_config  # noqa: F401
from .service.api import AudioSearchEngine  # noqa: F401

__version__ = "0.1.0"
__all__ = ["AudioSearchEngine", "EngineConfig", "default_config"]
