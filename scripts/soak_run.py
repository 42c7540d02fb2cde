"""Durable soak artifact (round-4 verdict item #9).

Promotes the one-off differential sweeps to a recorded artifact: runs
(a) the SQLite differential fuzzer (tests/test_differential_fuzz.py's
generator — SELECT/JOIN/subquery/window/set-op/recursive-CTE + DML +
trigger audits) across a SEED RANGE, (b) the transactional fuzz, and
(c) the mixed-workload SQL soak with checkpoints/reopens/crashes
(scripts/soak_sql.py), then writes SOAK_rNN.json with statement
counts, seeds, and failures. CI's pinned-seed subset
(tests/test_differential_fuzz.py) references this artifact as the
wide-sweep evidence; re-run with:

    JAX_PLATFORMS=cpu python scripts/soak_run.py [--seeds N] \
        [--rounds N] [--out SOAK_rNN.json]
"""

import argparse
import importlib.util
import json
import os
import random
import sqlite3
import sys
import tempfile
import time
import traceback

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from turdb_tpu.database.api import Database  # noqa: E402


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


FUZZ = _load("dfz", os.path.join(REPO, "tests", "test_differential_fuzz.py"))


def run_select_fuzz(seed, tmp):
    """One full differential round for a seed; returns (executed, fail)."""
    rng = random.Random(seed)
    db = Database.create(os.path.join(tmp, f"dz{seed}"))
    lite = sqlite3.connect(":memory:")
    executed = 0
    try:
        FUZZ._seed(db, lite, rng)
        g = FUZZ.Gen(rng)
        for rnd in range(5):
            for _ in range(40):
                sql = g.select()
                ours = FUZZ.norm(db.query(sql))
                theirs = FUZZ.norm(lite.execute(sql).fetchall())
                if not FUZZ.rows_match(ours, theirs):
                    return executed, f"seed={seed} SQL: {sql[:200]}"
                executed += 1
            for _ in range(8):
                sql = g.dml()
                db.execute(sql)
                lite.execute(sql)
                executed += 1
            q = "SELECT * FROM audit"
            if not FUZZ.rows_match(
                FUZZ.norm(db.query(q)), FUZZ.norm(lite.execute(q).fetchall())
            ):
                return executed, f"seed={seed} audit divergence"
        return executed, None
    except Exception:
        return executed, f"seed={seed} {traceback.format_exc(limit=3)}"
    finally:
        db.close()
        lite.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=220,
                    help="differential fuzz seed count (seeds 1000..)")
    ap.add_argument("--rounds", type=int, default=120,
                    help="mixed-workload soak rounds (soak_sql.py)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    t0 = time.time()
    out = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "differential": {"seeds": [], "statements": 0, "failures": []},
        "soak_sql": {},
    }

    tmp = tempfile.mkdtemp()
    for seed in range(1000, 1000 + args.seeds):
        n, fail = run_select_fuzz(seed, tmp)
        out["differential"]["seeds"].append(seed)
        out["differential"]["statements"] += n
        if fail:
            out["differential"]["failures"].append(fail)
        if (seed - 1000) % 20 == 19:
            print(
                f"differential: {seed - 999}/{args.seeds} seeds, "
                f"{out['differential']['statements']} stmts, "
                f"{len(out['differential']['failures'])} failures, "
                f"{time.time() - t0:.0f}s",
                flush=True,
            )

    # mixed-workload soak (checkpoints/reopens/crash-reopens)
    import subprocess

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "soak_sql.py"),
         str(args.rounds)],
        capture_output=True, text=True, env={**os.environ,
                                             "JAX_PLATFORMS": "cpu"},
    )
    tail = (r.stdout or "").strip().rsplit("\n", 1)[-1]
    out["soak_sql"] = {
        "rounds": args.rounds,
        "ok": r.returncode == 0 and tail.startswith("SOAK OK"),
        "summary": tail[:300],
    }
    if r.returncode != 0:
        out["soak_sql"]["stderr"] = (r.stderr or "")[-500:]

    out["wall_s"] = round(time.time() - t0, 1)
    out["pass"] = (
        not out["differential"]["failures"] and out["soak_sql"]["ok"]
    )
    path = args.out or os.path.join(REPO, "SOAK_r04.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "differential"}
                     | {"differential_statements":
                        out["differential"]["statements"],
                        "differential_failures":
                        len(out["differential"]["failures"])}))
    sys.exit(0 if out["pass"] else 1)


if __name__ == "__main__":
    main()
