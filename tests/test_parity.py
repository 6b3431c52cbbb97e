"""A/B parity vs the reference GeneEvolve binary. Runs BY DEFAULT in the
normal pytest suite on Examples 1 and 5 (assortative and random mating,
~90 s with a warm compile cache); opt out with GE_PARITY=0, select examples
with GE_PARITY_ONLY=1,5.

Full sweep: `python tools/parity.py` (all 10 Example scenarios + VCF).
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
REF_BIN = Path("/root/reference/GeneEvolve_Linux")


@pytest.mark.skipif(
    os.environ.get("GE_PARITY") == "0", reason="GE_PARITY=0 opts out"
)
@pytest.mark.skipif(not REF_BIN.exists(), reason="reference binary missing")
def test_summary_parity_vs_reference_binary(tmp_path):
    only = os.environ.get("GE_PARITY_ONLY", "1,5")
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "parity.py"),
            "--only",
            only,
            "--workdir",
            str(tmp_path),
        ],
        capture_output=True,
        text=True,
        timeout=3600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr[-2000:])
    assert proc.returncode == 0, "parity checks failed (see table above)"
