"""Examples smoke tier (VERDICT r3 weak #6): every `examples/*.py` runs
headless end-to-end — 19 entry points that previously had zero CI
coverage and could rot silently.  Each example's `main()` is invoked
with its outputs redirected into tmp_path (same basename, so extension-
driven writers keep working) and, where the signature allows, a tiny
frame count."""

import importlib.util
import inspect
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXDIR = os.path.join(REPO, "examples")
EXAMPLES = sorted(f for f in os.listdir(EXDIR) if f.endswith(".py"))


@pytest.mark.slow
@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)          # relative outputs land in tmp
    spec = importlib.util.spec_from_file_location(
        f"example_{name[:-3]}", os.path.join(EXDIR, name))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    main = getattr(mod, "main", None)
    assert main is not None, f"{name} has no main()"

    kwargs = {}
    for pname, p in inspect.signature(main).parameters.items():
        if pname in ("out", "out_dir") and isinstance(p.default, str):
            base = os.path.basename(p.default.rstrip("/")) or "out"
            kwargs[pname] = str(tmp_path / base)
        elif pname == "frames":
            kwargs[pname] = 2
    main(**kwargs)

    # Whatever the example wrote must actually exist and be non-empty.
    for v in kwargs.values():
        if isinstance(v, str) and os.path.exists(v):
            if os.path.isdir(v):
                assert os.listdir(v), (name, v)
            else:
                assert os.path.getsize(v) > 0, (name, v)
