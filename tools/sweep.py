#!/usr/bin/env python3
"""Both-scale-factor correctness sweep in one command (round-5 verdict #9).

Runs graft.Verify + the DuckDB oracle gate at sf0.01 (the driver's gate
scale) AND sf0.1 (10x — the scale that caught two real defects the gate
could not, SURVEY addendum 17), and writes one combined artifact.

Usage: python3 tools/sweep.py [--jobs N] [--out SWEEP.md]

Dev tool only (driver-side python); the engine itself has no Python.
"""
import argparse, datetime, subprocess, sys, os, re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFS = [("sf0.01", "/root/testdata/sf0.01"), ("sf0.1", "/root/testdata/sf0.1")]


def run_sf(tag, sfdir, jobs):
    out = f"/tmp/sweep_{tag}"
    print(f"[sweep] verify dump at {tag} -> {out}", flush=True)
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {sfdir} {out}"],
        cwd=REPO, capture_output=True, text=True)
    if r.returncode != 0:
        return (tag, None, None, f"sbt Verify failed rc={r.returncode}")
    print(f"[sweep] oracle gate at {tag}", flush=True)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"),
         sfdir, out, "--jobs", str(jobs)],
        capture_output=True, text=True)
    tail = r.stdout.strip().splitlines()
    summary = tail[-1] if tail else ""
    m = re.match(r"(\d+) passed, (\d+) failed", summary)
    fails = [l for l in tail if l.startswith("FAIL")]
    if not m:
        return (tag, None, None, f"unparseable checker output: {summary}")
    return (tag, int(m.group(1)), int(m.group(2)), "\n".join(fails))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jobs", type=int, default=6)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    results = [run_sf(tag, sfdir, args.jobs) for tag, sfdir in SFS]
    stamp = datetime.datetime.now().isoformat(timespec="seconds")
    lines = [f"# Both-SF oracle sweep — {stamp}", "",
             "| sf | passed | failed |", "|---|---|---|"]
    ok = True
    for tag, p, f, detail in results:
        if p is None:
            lines.append(f"| {tag} | ERROR | {detail} |")
            ok = False
        else:
            lines.append(f"| {tag} | {p} | {f} |")
            if f:
                ok = False
                lines.append("")
                lines.append("```")
                lines.append(detail)
                lines.append("```")
    text = "\n".join(lines) + "\n"
    print(text)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(text)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
