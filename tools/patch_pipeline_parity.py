"""Re-run ONLY the pipeline section of the on-chip parity certificate and
merge it into the existing PARITY_TPU.json (avoids repeating the ~7 min
oracle stage when only the pipeline comparison changed).

Usage: python tools/patch_pipeline_parity.py [pipe.npz]
(Expects gen_pipeline_stage to have produced pipe.npz already; default
path matches tpu_parity_check.main.)
"""
from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
for p in (str(ROOT), str(ROOT / "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)

import tpu_parity_check as tpc  # noqa: E402


def main():
    import subprocess

    pipe = Path(
        sys.argv[1]
        if len(sys.argv) > 1
        else Path(tempfile.gettempdir()) / "frp_tpu_parity_pipe.npz"
    )
    pipe_dump = Path(tempfile.gettempdir()) / "frp_tpu_parity_pipe_out.npz"
    pipe_sec = Path(tempfile.gettempdir()) / "frp_tpu_parity_pipe.json"
    import bench

    bench.setup_cache()
    section = tpc.tpu_pipeline_stage(pipe, pipe_dump)
    pipe_sec.write_text(json.dumps(section))
    # f64 audit runs in a CPU+x64 subprocess (this process binds the TPU)
    rc = subprocess.call(
        [sys.executable, str(ROOT / "tools" / "tpu_parity_check.py"),
         "--pipe-audit", str(pipe), str(pipe_dump), str(pipe_sec)],
        cwd=str(ROOT),
    )
    if rc != 0:
        raise SystemExit(rc)
    out = ROOT / "PARITY_TPU.json"
    data = json.loads(out.read_text()) if out.exists() else {}
    data["pipeline"] = json.loads(pipe_sec.read_text())
    out.write_text(json.dumps(data, indent=1))
    print("PARITY_TPU.json pipeline section updated", flush=True)


if __name__ == "__main__":
    main()
