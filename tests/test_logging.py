"""MetricsLogger: append-only CSV sink (fixed O(n^2) rewrite, VERDICT r1 #9)."""

import csv

from eva_vos_tpu.utils.logging import MetricsLogger
import pytest

pytestmark = pytest.mark.smoke


def _read(path):
    with open(path, newline="") as fh:
        return list(csv.DictReader(fh))


def test_rows_roundtrip(tmp_path):
    lg = MetricsLogger("t", out_dir=tmp_path)
    for i in range(5):
        lg.log({"step": i, "loss": i * 0.5})
    lg.close()
    rows = _read(lg.out_path)
    assert len(rows) == 5
    assert rows[3]["step"] == "3" and rows[3]["loss"] == "1.5"


def test_schema_widens_once_then_appends(tmp_path, monkeypatch):
    lg = MetricsLogger("t", out_dir=tmp_path)
    reopens = []
    orig = MetricsLogger._reopen
    monkeypatch.setattr(MetricsLogger, "_reopen",
                        lambda self: (reopens.append(1), orig(self))[1])
    lg.log({"step": 0})
    lg.log({"step": 1, "loss": 0.5})    # new key -> one rewrite
    for i in range(2, 50):
        lg.log({"step": i, "loss": 0.1})  # stable schema -> pure appends
    lg.close()
    assert len(reopens) == 2
    rows = _read(lg.out_path)
    assert len(rows) == 50
    assert rows[0]["loss"] == ""  # restval for the pre-widening row
    assert rows[49]["step"] == "49"
