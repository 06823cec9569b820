import numpy as np
import pytest

from multimodal_audio_search_tpu.index.analyzer import (
    KeywordAnalyzer, SemanticAnalyzer)

import reference_oracle as oracle
from reference_oracle import available, get_method

QUERIES = [
    "",
    "random nonsense zzz",
    "what did the person say",
    "upbeat music with drums",
    "person speaking clearly",
    "guitar solo",
    "lyrics about love with piano",   # mixed
    "say speak talk tell words",      # many ASR hits
    "drums guitar piano melody beat rhythm",  # many audio hits
    "the word bass",                  # 'word' is ASR, 'bass' is audio
    "CALL me maybe",                  # case folding; 'call' duplicated in lexicon
    "recording",                      # appears in BOTH lexicons
    "a calm voice reading a story",
    "fast loud electronic techno",
    "singing",                        # in both asr (sing/singing) and audio? check
    "whisper",                        # substring of 'whispering' in both lists
]


@pytest.mark.parametrize("query", QUERIES)
def test_keyword_analyzer_matches_reference(query):
    if not available():
        pytest.skip("reference not mounted")
    ref = get_method("_analyze_query_for_weights")
    exp_asr, exp_audio, exp_analysis = ref(query)
    got = KeywordAnalyzer()(query)
    assert got.asr_weight == pytest.approx(exp_asr, abs=1e-12)
    assert got.audio_weight == pytest.approx(exp_audio, abs=1e-12)
    assert got.analysis == exp_analysis


def test_keyword_analyzer_spec():
    a = KeywordAnalyzer()
    r = a("completely unrelated xyz")
    assert r.asr_weight == r.audio_weight == 0.5
    # one-sided saturates at 0.8 after >= 3 matches
    r = a("say speak talk tell told")
    assert r.asr_weight == pytest.approx(0.8)
    # weights always sum to 1 and stay within [0.2, 0.8]
    for q in QUERIES:
        r = a(q)
        assert r.asr_weight + r.audio_weight == pytest.approx(1.0)
        assert 0.2 - 1e-9 <= r.asr_weight <= 0.8 + 1e-9


def test_duplicate_keywords_count_twice():
    # 'call' appears twice in the reference asr lexicon (lines 465 & 499),
    # so a query containing only 'call' yields 2 matches -> strength 2/3.
    r = KeywordAnalyzer()("call")
    assert r.asr_matches == 2
    assert r.asr_weight == pytest.approx(0.5 + 0.3 * (2 / 3.0))


def test_semantic_analyzer_bounds():
    rng = np.random.default_rng(0)

    def fake_embed(texts):
        out = rng.normal(size=(len(texts), 16))
        return out / np.linalg.norm(out, axis=-1, keepdims=True)

    s = SemanticAnalyzer(fake_embed)
    r = s("guitar music")
    assert 0.1 <= r.asr_weight <= 0.9
    assert r.asr_weight + r.audio_weight == pytest.approx(1.0)


def test_keyword_analyzer_fuzz_parity(rng):
    """Broad random-phrase parity sweep against the reference's own
    analyzer (AST-extracted oracle)."""
    if not available():
        pytest.skip("reference not mounted")
    ref = get_method("_analyze_query_for_weights")
    from multimodal_audio_search_tpu.index.lexicon import (
        ASR_QUERY_KEYWORDS, AUDIO_QUERY_KEYWORDS)
    pool = (list(ASR_QUERY_KEYWORDS)[::7] + list(AUDIO_QUERY_KEYWORDS)[::11]
            + ["xyzzy", "flurb", "random", "words", "THE", "Person!"])
    a = KeywordAnalyzer()
    for i in range(150):
        n = int(rng.integers(0, 7))
        q = " ".join(rng.choice(pool, size=n)) if n else ""
        exp_asr, exp_audio, exp_analysis = ref(q)
        got = a(q)
        assert got.asr_weight == pytest.approx(exp_asr, abs=1e-12), q
        assert got.analysis == exp_analysis, q


@pytest.mark.skipif(not oracle.available(), reason="reference absent")
def test_classifier_keyword_oracle_exact():
    """classify_query_keyword == the backup's analyze_query_type_keyword
    (decision AND confidence), incl. the 2x phrase-pattern scoring."""
    from multimodal_audio_search_tpu.index.analyzer import (
        classify_query_keyword)
    ref = oracle.get_backup_function("analyze_query_type_keyword")
    queries = [
        "someone saying hello world", "drums and bass guitar",
        "a woman speaking about history", "rain and wind ambient noise",
        "person talking over piano music", "engine noise with footsteps",
        "the phrase \"good morning\" in english", "",
        "man saying goodbye with accent", "synthesizer beat drop",
        "interview discussion", "bird sounds in nature",
        "just random text with nothing", "music", "speech",
        "lecture about violins", "podcast with ambient background",
        "woman speaking french in english", "tell me a story",
        "door slam sound effect", "narrator commentary over a song",
    ]
    rng = np.random.default_rng(5)
    words = ("music speech talking drums sound someone saying person "
             "voice noise guitar words engine telling accent in english "
             "rain bird podcast news melody rhythm beat bass").split()
    for _ in range(150):
        n = rng.integers(1, 7)
        queries.append(" ".join(rng.choice(words, size=n)))
    for q in queries:
        want = ref(q)
        got = classify_query_keyword(q)
        assert got[0] == want[0] and abs(got[1] - want[1]) < 1e-12, (
            q, got, want)


def test_classifier_analyzer_weights():
    from multimodal_audio_search_tpu.index.analyzer import make_analyzer
    a = make_analyzer("classifier")
    wa = a("someone saying hello")          # speech phrase -> speech
    assert wa.asr_weight > 0.5
    wa = a("instrumental drums")            # audio keywords
    assert wa.asr_weight < 0.5
    wa = a("zzz qqq")                       # nothing -> audio at 0.5
    assert abs(wa.asr_weight - 0.5) < 1e-9
