"""utils.trace_summary: offline trace aggregation on a synthetic trace."""

import gzip
import json
import os

from mf_data_locality_tpu.utils import trace_summary


def _write_trace(tmp_path):
    events = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 2, "name": "process_name",
         "args": {"name": "Host threads"}},
        {"ph": "X", "pid": 1, "name": "copy.1", "dur": 10.0, "ts": 0},
        {"ph": "X", "pid": 1, "name": "copy.1", "dur": 5.0, "ts": 20},
        {"ph": "X", "pid": 1, "name": "fusion.7", "dur": 40.0, "ts": 30},
        # host-track event must be excluded
        {"ph": "X", "pid": 2, "name": "copy.9", "dur": 99.0, "ts": 0},
    ]
    d = os.path.join(tmp_path, "plugins", "profile", "run1")
    os.makedirs(d)
    with gzip.open(os.path.join(d, "host.trace.json.gz"), "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def test_op_durations_and_matching(tmp_path):
    d = _write_trace(tmp_path)
    durs = trace_summary.op_durations(d)
    assert durs == {"copy.1": 15.0, "fusion.7": 40.0}
    assert trace_summary.total_matching(d, "copy.") == 15.0
    assert trace_summary.top_ops(d, 1) == [("fusion.7", 40.0)]


def test_empty_dir(tmp_path):
    assert trace_summary.op_durations(str(tmp_path)) == {}
    assert trace_summary.total_matching(str(tmp_path), "copy.") == 0.0
