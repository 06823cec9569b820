"""Execute the reference's *pure* methods as test oracles.

The reference module imports streamlit/torch/librosa at top level, so it can't
be imported directly here. Its validator and query-analyzer methods, however,
are pure functions of their string argument — we AST-extract just those
function defs and exec them standalone (with ``self`` dropped). This gives
true decision-parity oracles without importing (or copying) reference code.

Skipped automatically when /root/reference is absent.
"""
import ast
import pathlib

REF = pathlib.Path("/root/reference/audio_search.py")

_cache = {}


def available() -> bool:
    return REF.exists()


def get_method(name: str):
    """Return the reference method ``name`` as a standalone callable."""
    if name in _cache:
        return _cache[name]
    tree = ast.parse(REF.read_text())
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == name:
            node.args.args = node.args.args[1:]  # drop self
            node.decorator_list = []
            mod = ast.Module(body=[node], type_ignores=[])
            ast.fix_missing_locations(mod)
            ns: dict = {"print": lambda *a, **k: None}
            import typing
            ns.update(Tuple=typing.Tuple, List=typing.List, Dict=typing.Dict)
            exec(compile(mod, str(REF), "exec"), ns)
            _cache[name] = ns[name]
            return ns[name]
    raise KeyError(name)


BACKUP = pathlib.Path(
    "/root/reference/previous_iterations/streamlit_app_backup.py")


def get_backup_function(name: str):
    """Module-level function from the backup file (which does NOT parse as
    a whole — broken indentation at 1086-1145 — so slice its text)."""
    key = f"backup:{name}"
    if key in _cache:
        return _cache[key]
    lines = BACKUP.read_text().splitlines()
    start = next(i for i, ln in enumerate(lines)
                 if ln.startswith(f"def {name}("))
    end = next((i for i in range(start + 1, len(lines))
                if lines[i] and not lines[i][0].isspace()),
               len(lines))
    src = "\n".join(lines[start:end])
    import re
    ns: dict = {"print": lambda *a, **k: None, "re": re}
    exec(compile(ast.parse(src), str(BACKUP), "exec"), ns)
    _cache[key] = ns[name]
    return ns[name]
