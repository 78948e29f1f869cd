"""bench_all.py partial-refresh merge: replaced rows update in place,
new rows append, untouched rows survive a subset re-run."""
import importlib.util
import json
import os


def _load_bench_all():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_all_mod", os.path.join(root, "bench_all.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_merge_replaces_and_appends(tmp_path):
    mod = _load_bench_all()
    mod.BENCH_PATH = str(tmp_path / "BENCH_ALL.json")
    old = [{"model": "a", "img_s": 1.0},
           {"model": "b", "img_s": 2.0}]
    with open(mod.BENCH_PATH, "w") as f:
        json.dump(old, f)
    mod._merge_and_write([{"model": "b", "img_s": 9.0},
                          {"model": "c", "img_s": 3.0}], partial=True)
    with open(mod.BENCH_PATH) as f:
        merged = json.load(f)
    assert [r["model"] for r in merged] == ["a", "b", "c"]
    assert merged[1]["img_s"] == 9.0        # replaced in place
    assert merged[0]["img_s"] == 1.0        # untouched row survives


def test_merge_without_existing_file(tmp_path):
    mod = _load_bench_all()
    mod.BENCH_PATH = str(tmp_path / "BENCH_ALL.json")
    mod._merge_and_write([{"model": "x", "img_s": 5.0}], partial=True)
    with open(mod.BENCH_PATH) as f:
        assert json.load(f) == [{"model": "x", "img_s": 5.0}]


def test_full_run_overwrites_and_prunes(tmp_path):
    mod = _load_bench_all()
    mod.BENCH_PATH = str(tmp_path / "BENCH_ALL.json")
    with open(mod.BENCH_PATH, "w") as f:
        json.dump([{"model": "obsolete", "img_s": 1.0}], f)
    mod._merge_and_write([{"model": "x", "img_s": 5.0}], partial=False)
    with open(mod.BENCH_PATH) as f:
        assert json.load(f) == [{"model": "x", "img_s": 5.0}]


def test_partial_refuses_corrupt_or_malformed(tmp_path):
    import pytest
    mod = _load_bench_all()
    mod.BENCH_PATH = str(tmp_path / "BENCH_ALL.json")
    with open(mod.BENCH_PATH, "w") as f:
        f.write("{not json")
    with pytest.raises(json.JSONDecodeError):
        mod._merge_and_write([{"model": "x"}], partial=True)
    with open(mod.BENCH_PATH, "w") as f:
        json.dump({"model": "dict-not-list"}, f)
    with pytest.raises(SystemExit):
        mod._merge_and_write([{"model": "x"}], partial=True)
    # a full run doesn't care — it overwrites
    mod._merge_and_write([{"model": "x"}], partial=False)
    with open(mod.BENCH_PATH) as f:
        assert json.load(f) == [{"model": "x"}]
