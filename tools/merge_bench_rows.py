"""Merge captured BENCHRESULT lines into BENCH_CONFIGS.json.

Used when individual rows are recaptured outside the orchestrated sweep
(e.g. after a chip-outage window ate the sweep budget): reads worker logs,
extracts the BENCHRESULT JSON, and overwrites the named row — same shape
as the sweep's own row-merge, so the artifact stays driver-auditable.

Usage:
  python tools/merge_bench_rows.py serving=/tmp/row_serving.log \
      headline-words=/tmp/row_words.log presets.large-beam=/tmp/row_beam.log
"""

import json
import os
import sys
import time

MARKER = "BENCHRESULT "


def main(argv):
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_CONFIGS.json")
    data = json.load(open(path))
    stamp = time.strftime("%Y-%m-%dT%H:%M:%S")
    for spec in argv:
        key, log = spec.split("=", 1)
        row = None
        for line in open(log, errors="replace"):
            if MARKER in line:
                row = json.loads(line.split(MARKER, 1)[1])
        if row is None or "value" not in row:
            print(f"SKIP {key}: no result in {log}")
            continue
        row["captured_at"] = stamp
        row.pop("stale", None)
        if key.startswith("presets."):
            data["presets"][key.split(".", 1)[1]] = row
        else:
            data[key] = row
        print(f"merged {key} = {row['value']}")
    json.dump(data, open(path, "w"), indent=2)


if __name__ == "__main__":
    main(sys.argv[1:])
