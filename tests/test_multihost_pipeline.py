"""Multi-host data-pipeline logic under SIMULATED process_count > 1.

Validates the process-0-execute / barrier / cache-replay protocol of
_run_on_primary (reference DistributedContext + distributed_process,
src/utilities/data_utils.py) without real multi-host hardware: jax process
APIs and the barrier are monkeypatched, and the barrier ORDER is recorded to
prove non-primary hosts only touch the Arrow op after the primary is done.
"""

import numpy as np
import pytest

datasets = pytest.importorskip("datasets")

from huggingface_asr_tpu.data import datasets as D


class _FakeDist:
    def __init__(self, index, count, log):
        self.index, self.count, self.log = index, count, log


def _patch(monkeypatch, index, count, log):
    import jax

    monkeypatch.setattr(jax, "process_index", lambda: index)
    monkeypatch.setattr(jax, "process_count", lambda: count)
    monkeypatch.setattr(D, "_host_barrier", lambda tag: log.append((index, tag)))


def _ds():
    return datasets.Dataset.from_dict({"x": list(range(10))})


def test_primary_executes_then_barriers(monkeypatch):
    log = []
    _patch(monkeypatch, index=0, count=2, log=log)
    calls = []
    ds = _ds()
    orig_map = ds.map

    def traced_map(**kw):
        calls.append("map")
        return orig_map(**kw)

    monkeypatch.setattr(ds, "map", traced_map)
    out = D._run_on_primary(ds, "map", "t1", function=lambda ex: {"x": ex["x"] + 1})
    assert calls == ["map"]
    assert log == [(0, "t1:done")]  # barrier AFTER executing
    assert out["x"][0] == 1


def test_secondary_barriers_before_touching_arrow(monkeypatch):
    log = []
    _patch(monkeypatch, index=1, count=2, log=log)
    order = []
    ds = _ds()
    orig_map = ds.map

    def traced_map(**kw):
        order.append("map")
        return orig_map(**kw)

    monkeypatch.setattr(ds, "map", traced_map)
    monkeypatch.setattr(
        D, "_host_barrier", lambda tag: (log.append(tag), order.append("barrier"))
    )
    out = D._run_on_primary(ds, "map", "t2", function=lambda ex: {"x": ex["x"] * 2})
    # non-primary must wait for the primary's barrier BEFORE running the op
    # (which is then served from the shared Arrow cache)
    assert order == ["barrier", "map"]
    assert out["x"][2] == 4


def test_single_process_skips_barriers(monkeypatch):
    log = []
    _patch(monkeypatch, index=0, count=1, log=log)
    out = D._run_on_primary(_ds(), "filter", "t3", function=lambda ex: ex["x"] < 5)
    assert len(out) == 5
    assert log == []  # no barrier traffic in the single-host fast path


def test_prepare_dataset_multihost_parity(monkeypatch, tmp_path):
    """prepare_dataset under simulated 2-host run (both roles) must equal the
    single-host result row for row."""
    rng = np.random.default_rng(0)
    rows = {
        "audio": [rng.standard_normal(3200).astype(np.float32) for _ in range(6)],
        "text": [f"utt {i}" for i in range(6)],
        "input_len": [0.2] * 6,
    }
    base = datasets.DatasetDict({"train": datasets.Dataset.from_dict(rows),
                                 "test": datasets.Dataset.from_dict(rows)})
    path = str(tmp_path / "ds")
    base.save_to_disk(path)

    def run(index, count):
        import jax

        log = []
        monkeypatch.setattr(jax, "process_index", lambda: index)
        monkeypatch.setattr(jax, "process_count", lambda: count)
        monkeypatch.setattr(D, "_host_barrier", lambda tag: log.append(tag))
        cfg = D.DataConfig(
            dataset_name=path, load_from_disk=True, do_resample=False,
            max_duration_in_seconds=1.0,
        )
        return D.get_dataset(cfg), log

    single, log1 = run(0, 1)
    primary, log_p = run(0, 2)
    secondary, log_s = run(1, 2)
    assert log1 == []
    assert len(log_p) > 0 and log_p == log_s  # same barrier sequence
    for split in single:
        assert single[split]["text"] == primary[split]["text"] == secondary[split]["text"]
