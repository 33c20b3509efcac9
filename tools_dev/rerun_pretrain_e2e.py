"""Re-measure ONLY the streaming-RTF + pretrain step-bound + e2e entries of
benchmarks/extra_metrics.json in place (bench.run_extra's last two
measured sections), after a bench.py change to those measurements.
Everything else in the artifact is left as the last full --extra run.

Run (real chip, idle host): python tools_dev/rerun_pretrain_e2e.py
"""

import json
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def main():
    path = REPO / "benchmarks" / "extra_metrics.json"
    data = json.loads(path.read_text())

    with tempfile.TemporaryDirectory(prefix="bench_rtf_") as tmp:
        rtf = bench.measure_streaming_rtf(tmp)
    step_metric = bench.measure_pretrain_step()
    with tempfile.TemporaryDirectory(prefix="bench_pretrain_") as tmp:
        e2e = bench.measure_pretrain_e2e(
            tmp, compute_bound=step_metric["bf16_clips_per_sec"]
        )

    new = {m["metric"]: m for m in (rtf, step_metric, e2e)}
    replaced = 0
    for i, m in enumerate(data["metrics"]):
        if m["metric"] in new:
            data["metrics"][i] = new.pop(m["metric"])
            replaced += 1
    assert replaced == 3, f"expected to replace 3 entries, replaced {replaced}"
    path.write_text(json.dumps(data, indent=1))
    print(json.dumps([step_metric, e2e], indent=1))


if __name__ == "__main__":
    main()
