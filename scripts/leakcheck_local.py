#!/usr/bin/env python3
"""Builder-side leak sweep, self-evidencing: re-runs the LEAKCHECK grep
classes over the shipped surface (src/, build.sbt, scripts/) and writes
LEAKCHECK_local.json stamped with the commit SHA and a UTC timestamp, so
each round's sweep names exactly the tree it certified (the driver's
LEAKCHECK.json carries no provenance fields).

Usage: python3 scripts/leakcheck_local.py   (from the repo root)
Exit 1 if any class hits.
"""
import json
import re
import subprocess
import sys
from datetime import datetime, timezone
from pathlib import Path

PATTERNS = {
    # proprietary/internal systems must never be referenced: imports or
    # coordinates outside the sanctioned set (spark/scala/java/scalatest)
    "internal-import": r"import\s+(?:com|net|io)\.(?!fasterxml)[a-z0-9_]+\.(?:internal|proprietary)",
    "internal-url": r"https?://[a-z0-9.-]*\.(?:corp|internal)\b",
    "internal-bucket": r"(?:s3|gs|abfss?)://[a-z0-9._-]+",
    "slack-link": r"(?:slack\.com/archives|#[a-z0-9-]*-internal)",
    "api-key": r"(?:api[_-]?key|secret[_-]?key)\s*[:=]\s*['\"][A-Za-z0-9+/]{16,}",
    "env-secret": r"sys\.env\([\"'](?:.*TOKEN|.*SECRET|.*APIKEY)[\"']\)",
}

SCAN = ["src", "build.sbt", "scripts"]


def files():
    for root in SCAN:
        p = Path(root)
        if p.is_file():
            yield p
        elif p.is_dir():
            for f in p.rglob("*"):
                if f.is_file() and f.suffix in {".scala", ".sbt", ".py", ".sh", ".md"}:
                    yield f


def main():
    hits = {k: [] for k in PATTERNS}
    for f in files():
        try:
            text = f.read_text(errors="replace")
        except OSError:
            continue
        for name, pat in PATTERNS.items():
            for m in re.finditer(pat, text, re.IGNORECASE):
                line = text.count("\n", 0, m.start()) + 1
                hits[name].append(f"{f}:{line}:{m.group(0)[:80]}")
    sha = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                         text=True).stdout.strip()
    n = sum(len(v) for v in hits.values())
    out = {
        "commit": sha,
        "timestamp_utc": datetime.now(timezone.utc).isoformat(),
        "n_hits": n,
        "hits": hits,
    }
    Path("LEAKCHECK_local.json").write_text(json.dumps(out, indent=2) + "\n")
    print(f"{n} hits @ {sha[:12]}")
    sys.exit(1 if n else 0)


if __name__ == "__main__":
    main()
