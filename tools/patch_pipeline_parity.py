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
    pipe = Path(
        sys.argv[1]
        if len(sys.argv) > 1
        else Path(tempfile.gettempdir()) / "frp_tpu_parity_pipe.npz"
    )
    import bench

    bench.setup_cache()
    section = tpc.tpu_pipeline_stage(pipe)
    out = ROOT / "PARITY_TPU.json"
    data = json.loads(out.read_text()) if out.exists() else {}
    data["pipeline"] = section
    out.write_text(json.dumps(data, indent=1))
    print("PARITY_TPU.json pipeline section updated", flush=True)


if __name__ == "__main__":
    main()
