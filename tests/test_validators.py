import pytest

from multimodal_audio_search_tpu.pipelines.validators import (
    validate_asr_text, validate_audio_description)

from reference_oracle import available, get_method

ASR_CASES = [
    "", " ", "a", "hi", "um", "uh", "ah", "eh", "oh", "mm", "go!",
    "Hello there, how are you?", "laionionion noise", "ononon",
    "lalala" * 3, "lalala",  # only the tripled form is garbage
    "!!! ???", "a!!!!!!!!", "ok", "Umm",  # 'umm' is 3 chars but not in list
    "1234", ".,;:-", "x" * 500, "  spaced  out  ",
    "the quick brown fox", "UM", "Mm",
]

CAPTION_CASES = [
    "", "abc", "abcd", "music", "muse", "a piano melody plays",
    "someone speaking over ambient noise", "laionionion music",
    "pure silence here", "drums and guitar", "MUSIC LOUD",
    "this has no magic terms at all", "instrumental interlude",
    "a voice singing softly", "noise", "nois",
]


@pytest.mark.parametrize("text", ASR_CASES)
def test_asr_validator_matches_reference(text):
    if not available():
        pytest.skip("reference not mounted")
    ref = get_method("_validate_asr_text")
    assert bool(validate_asr_text(text)) == bool(ref(text)), text


@pytest.mark.parametrize("text", CAPTION_CASES)
def test_caption_validator_matches_reference(text):
    if not available():
        pytest.skip("reference not mounted")
    ref = get_method("_validate_audio_description")
    assert bool(validate_audio_description(text)) == bool(ref(text)), text


def test_asr_validator_spec():
    # self-contained spec checks (run even without the reference mounted)
    assert not validate_asr_text("a")          # < 2 chars
    assert validate_asr_text("hi")
    assert not validate_asr_text("um")         # filler
    assert validate_asr_text("umbrella")
    assert not validate_asr_text("xlaionionionx")
    assert not validate_asr_text("!!!! !!")    # low alnum ratio
    r = validate_asr_text("")
    assert not r.ok and r.reason == "too_short"


def test_caption_validator_spec():
    assert not validate_audio_description("abcd")       # < 5 chars
    assert not validate_audio_description("hello world")  # no audio keyword
    assert validate_audio_description("guitar riff")
    assert validate_audio_description("someone speaking")
    assert not validate_audio_description("laionionion music")
