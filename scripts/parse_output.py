#!/usr/bin/env python3
"""CLI-output parser (role of the reference's scripts/parse_output_file.py).

The reference's benchmark scripts regex the binary's stdout for cycle counts,
phase times, and the compression ratio. Our CLI emits the same human lines
plus an optional JSON record; this module parses either form.
"""

from __future__ import annotations

import json
import re
import sys

PHASE_RE = re.compile(r"^(\w+) time: ([0-9.]+)s$")
RATIO_RE = re.compile(r"^Compression ratio: ([0-9.]+)$")


def parse(text: str) -> dict:
    """Parse one CLI run's stdout into {ratio, phases_s, total_s, ...}."""
    result: dict = {"phases_s": {}}
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                result.update(json.loads(line))
                continue
            except json.JSONDecodeError:
                pass
        if m := RATIO_RE.match(line):
            result["ratio"] = float(m.group(1))
        elif m := PHASE_RE.match(line):
            name, secs = m.group(1), float(m.group(2))
            if name == "Total":
                result["total_s"] = secs
            else:
                result["phases_s"][name] = secs
    return result


def main() -> int:
    text = sys.stdin.read() if len(sys.argv) < 2 else open(sys.argv[1]).read()
    print(json.dumps(parse(text), indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
