"""CI-sized soak: the full mixed-workload invariant check
(scripts/soak_sql.py) at 30 rounds — prepared inserts, updates,
deletes, MERGE, savepoint txns, trigger audit, checkpoints, clean and
crash reopens, all verified against a dict model."""

import os
import subprocess
import sys


def test_soak_30_rounds():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "soak_sql.py"), "30"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "SOAK OK" in r.stdout
