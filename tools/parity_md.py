#!/usr/bin/env python3
"""Render a check_oracle.py run into a parity scoreboard markdown.

Usage: python3 tools/parity_md.py <checker_stdout_log> <out.md> <title>

Parses the checker's `ok NAME (N rows)` / `FAIL NAME: reason` /
`TIMEOUT NAME: reason` lines and writes a pass/diverge table, so a
scale-parity claim always has a committed artifact behind it.
"""
import re
import sys


def main(log_path: str, out_path: str, title: str) -> int:
    ok, bad = [], []
    for line in open(log_path):
        m = re.match(r"ok\s+(\S+) \((\d+) rows\)", line)
        if m:
            ok.append((m.group(1), int(m.group(2))))
            continue
        m = re.match(r"(FAIL|TIMEOUT) (\S+?):? (.*)", line)
        if m:
            bad.append((m.group(2).rstrip(":"), m.group(1), m.group(3).strip()))
    total = len(ok) + len(bad)
    lines = [
        f"# {title}",
        "",
        f"**{len(ok)}/{total} oracle-bearing queries hash-match** "
        "(rows + schema + value hash vs DuckDB on the same parquet).",
        "",
    ]
    if bad:
        lines += [
            f"## Diverging ({len(bad)})",
            "",
            "| query | kind | detail |",
            "|---|---|---|",
        ]
        for name, kind, why in sorted(bad):
            lines.append(f"| {name} | {kind} | {why[:200]} |")
        lines.append("")
    lines += [
        f"## Passing ({len(ok)})",
        "",
        "| query | rows |",
        "|---|---|",
    ]
    for name, rows in sorted(ok):
        lines.append(f"| {name} | {rows} |")
    lines.append("")
    open(out_path, "w").write("\n".join(lines))
    print(f"wrote {out_path}: {len(ok)} ok, {len(bad)} diverge")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
