"""On-hardware kernel correctness artifact: runs the hardware-gated test
tier (tests/test_tpu_hardware.py) on the real TPU and records the outcome
as TPUCHECK_r{N}.json next to the bench artifacts.

Usage: python benchmarks/tpu_check.py [round_number]
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    rnd = sys.argv[1] if len(sys.argv) > 1 else "03"
    env = dict(os.environ, RBT_TPU_TESTS="1",
               PYTHONPATH=ROOT + ":" + os.environ.get("PYTHONPATH", ""))
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_tpu_hardware.py",
         "-q", "--no-header"],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=5400)
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout else ""
    rec = {
        "check": "tpu_hardware_kernel_correctness",
        "ok": proc.returncode == 0,
        "summary": tail,
        "tests": "tests/test_tpu_hardware.py (fused RowMajor philox+"
                 "threefry, unaligned submatrix, fused ColMajor, "
                 "BlockedELL, word-plane fill bit-identity, word-major "
                 "BlockedELL fast path, fused-kernel jax.grad, f64 "
                 "hiprec, SRHT apply+adjoint, SASO panels/gather, COO "
                 "densify, tensor sketch, sgmres, one-pass SVD, "
                 "rand_geigh, xtrace/xdiag, kaczmarz/GS, rgs_qr, "
                 "SLQ+KPM density, FrequentDirections certificate, "
                 "distributed FD (shard_map scan merge), "
                 "shard_map fused sketch, distributed CholQR/RSVD, "
                 "Pallas SASO kernel, KFJLT, TT round/from_dense, "
                 "Tucker ST-HOSVD, ihs_lsq heavy-ball)",
    }
    path = os.path.join(ROOT, f"TPUCHECK_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
