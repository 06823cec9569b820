"""Extract the query-analyzer keyword lexicons from the reference as data.

The reference's fusion weights depend on substring counts over two keyword
lists defined inline in ``_analyze_query_for_weights``
(/root/reference/audio_search.py:462-583). Duplicated entries in those lists
count twice in ``sum(1 for kw in keywords if kw in query)``, so exact parity
requires the exact multiset of keywords. This tool AST-parses the reference
and emits the two lists verbatim (as *data*, with provenance) into
``multimodal_audio_search_tpu/index/lexicon.py``.

Run: python tools/extract_lexicon.py
"""
import ast
import pathlib

REF = pathlib.Path("/root/reference/audio_search.py")
REF_BACKUP = pathlib.Path(
    "/root/reference/previous_iterations/streamlit_app_backup.py")
OUT = pathlib.Path(__file__).resolve().parents[1] / (
    "multimodal_audio_search_tpu/index/lexicon.py"
)


def extract_list(tree: ast.AST, name: str) -> list[str]:
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name) and tgt.id == name:
                    val = ast.literal_eval(node.value)
                    if isinstance(val, list) and all(
                        isinstance(x, str) for x in val
                    ):
                        return val
    raise KeyError(name)


def slice_function(path: pathlib.Path, name: str) -> str:
    """Textually slice one top-level function (the file may not parse)."""
    lines = path.read_text().splitlines()
    start = next(i for i, ln in enumerate(lines)
                 if ln.startswith(f"def {name}("))
    end = next((i for i in range(start + 1, len(lines))
                if lines[i] and not lines[i][0].isspace()
                and not lines[i].startswith(")")), len(lines))
    return "\n".join(lines[start:end])


def main() -> None:
    tree = ast.parse(REF.read_text())
    # The analyzer lists live inside _analyze_query_for_weights; the caption
    # validator's 13 audio descriptors live inside _validate_audio_description.
    fn_lists = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name in (
            "_analyze_query_for_weights",
            "_validate_audio_description",
        ):
            sub = ast.Module(body=node.body, type_ignores=[])
            for want in ("asr_keywords", "audio_keywords"):
                try:
                    fn_lists[want] = extract_list(sub, want)
                except KeyError:
                    pass
    asr = fn_lists["asr_keywords"]
    audio = fn_lists["audio_keywords"]
    # caption-validator keywords: separate name to avoid clash
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.FunctionDef)
            and node.name == "_validate_audio_description"
        ):
            sub = ast.Module(body=node.body, type_ignores=[])
            caption_kw = extract_list(sub, "audio_keywords")

    # historical keyword classifier (streamlit_app_backup.py:363-430):
    # keyword lists + regex phrase patterns (phrases score 2x). The backup
    # file as a whole does NOT parse (broken indentation at 1086-1145, see
    # SURVEY), so slice out just this function's text region.
    btree = ast.parse(slice_function(REF_BACKUP,
                                     "analyze_query_type_keyword"))
    cls_lists = {}
    for node in ast.walk(btree):
        if isinstance(node, ast.FunctionDef) \
                and node.name == "analyze_query_type_keyword":
            sub = ast.Module(body=node.body, type_ignores=[])
            for want in ("speech_keywords", "audio_keywords",
                         "speech_phrases"):
                cls_lists[want] = extract_list(sub, want)

    def fmt(xs: list[str]) -> str:
        lines = ["("]
        for x in xs:
            lines.append(f"    {x!r},")
        lines.append(")")
        return "\n".join(lines)

    OUT.write_text(
        '"""Query-analyzer and validator keyword lexicons (behavioral data).\n'
        "\n"
        "Extracted verbatim by tools/extract_lexicon.py from the reference\n"
        "implementation so fusion-weight and validator decisions match exactly:\n"
        "  - ASR_QUERY_KEYWORDS   <- audio_search.py:462-500 (asr_keywords)\n"
        "  - AUDIO_QUERY_KEYWORDS <- audio_search.py:503-583 (audio_keywords)\n"
        "  - CAPTION_CONTENT_KEYWORDS <- audio_search.py:447-450\n"
        "\n"
        "These are tuples (ordered multisets): the reference counts matches with\n"
        "``sum(1 for kw in keywords if kw in query_lower)`` so duplicate entries\n"
        "legitimately count twice; do not deduplicate.\n"
        '"""\n\n'
        f"ASR_QUERY_KEYWORDS = {fmt(asr)}\n\n"
        f"AUDIO_QUERY_KEYWORDS = {fmt(audio)}\n\n"
        f"CAPTION_CONTENT_KEYWORDS = {fmt(caption_kw)}\n\n"
        "# Historical keyword classifier data "
        "(streamlit_app_backup.py:370-401):\n"
        "# keyword lists plus regex phrase patterns; phrase hits score 2x\n"
        "# (streamlit_app_backup.py:413-416).\n"
        f"CLASSIFIER_SPEECH_KEYWORDS = {fmt(cls_lists['speech_keywords'])}\n\n"
        f"CLASSIFIER_AUDIO_KEYWORDS = {fmt(cls_lists['audio_keywords'])}\n\n"
        f"CLASSIFIER_SPEECH_PHRASES = {fmt(cls_lists['speech_phrases'])}\n"
    )
    print(
        f"wrote {OUT}: {len(asr)} asr, {len(audio)} audio, "
        f"{len(caption_kw)} caption keywords, "
        f"{len(cls_lists['speech_keywords'])}/"
        f"{len(cls_lists['audio_keywords'])}/"
        f"{len(cls_lists['speech_phrases'])} classifier entries"
    )


if __name__ == "__main__":
    main()
