"""Logging/profiling utility tests."""
import json
import numpy as np

from deep_spectral_tpu.utils.logging import (
    SmoothedValue, MetricLogger, MetricWriter, set_seed, topk_accuracy,
)
from deep_spectral_tpu.utils.profiling import StageTimer


def test_smoothed_value():
    v = SmoothedValue(window_size=3)
    for x in [1, 2, 3, 4]:
        v.update(x)
    assert v.value == 4
    assert v.avg == 3.0          # window [2, 3, 4]
    assert v.global_avg == 2.5   # all four
    assert v.max == 4
    v.synchronize_between_processes()  # single-process no-op


def test_metric_logger_log_every(capsys):
    ml = MetricLogger()
    total = 0
    for x in ml.log_every(range(5), print_freq=2, header="test"):
        ml.update(loss=x)
        total += x
    assert total == 10
    out = capsys.readouterr().out
    assert "test [0" in out and "Total time" in out


def test_metric_writer(tmp_path):
    w = MetricWriter(tmp_path / "metrics.jsonl")
    w.log(0, loss=1.5, acc=0.2)
    w.log(1, loss=np.float32(1.2))
    w.close()
    lines = [json.loads(line) for line in
             (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert lines[0] == {"step": 0, "loss": 1.5, "acc": 0.2}
    assert lines[1]["loss"] == 1.2000000476837158 or abs(lines[1]["loss"] - 1.2) < 1e-6


def test_set_seed_deterministic():
    g1 = set_seed(42)
    a = g1.integers(0, 100, 5)
    g2 = set_seed(42)
    b = g2.integers(0, 100, 5)
    np.testing.assert_array_equal(a, b)


def test_topk_accuracy():
    logits = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    targets = np.array([1, 2])
    top1, top2 = topk_accuracy(logits, targets, topk=(1, 2))
    assert top1 == 50.0
    assert top2 == 50.0  # second sample's class 2 is rank 2 (tie by order)


def test_stage_timer():
    t = StageTimer()
    with t.stage("a", n_items=10):
        pass
    with t.stage("a", n_items=5):
        pass
    s = t.summary()
    assert "a" in s and "15" in s
