#!/usr/bin/env python3
"""Render the BASELINE.md per-query table from a Bench JSON line."""
import json
import sys

d = json.load(open(sys.argv[1]))
qs = sorted(d["queries"].items())
print(f'total {d["value"]:.1f}s over {len(qs)} queries; '
      f'cdc {d["cdc_rows_per_sec"]:.0f} rows/s; '
      f'stream {d["cdc_stream_rows_per_sec"]:.0f} rows/s')
print()
print("| query | sec | query | sec | query | sec |")
print("|---|---|---|---|---|---|")
for i in range(0, len(qs), 3):
    row = qs[i:i + 3]
    cells = "".join(f" `{n}` | {v:.2f} |" for n, v in row)
    cells += " |  |" * (3 - len(row))
    print("|" + cells)
