#!/usr/bin/env python3
"""Extract one query's section from an EXPLAIN.md dump.

Usage: extract_plan.py <explain_md_path_or_-> <query_key>

Prints the fenced plan block (the normalized `.explain("formatted")`
output ExplainDump wrote) for the named key. Used to build the
plans/r17/<key>_{before,after}.txt deliverables from the committed
EXPLAIN.md at two git revisions, so the judge can diff plan shapes
without running Spark.
"""
import sys


def main() -> int:
    path, key = sys.argv[1], sys.argv[2]
    text = sys.stdin.read() if path == "-" else open(path).read()
    # a section that starts at byte 0 of the file has no leading newline
    if text.startswith(f"## {key}\n"):
        i = 0
    else:
        i = text.find(f"\n## {key}\n")
        if i < 0:
            sys.stderr.write(f"key {key} not found\n")
            return 1
    j = text.find("\n## ", i + 1)
    section = text[i:j if j > 0 else len(text)]
    # keep only the FIRST fenced block: spanning find..rfind would leak
    # interior fence markers and prose when a section holds several
    # fenced blocks (r17 advice)
    a = section.find("```\n")
    b = section.find("\n```", a + 4)
    if a < 0 or b <= a:
        sys.stderr.write(f"no fenced plan in section {key}\n")
        return 1
    sys.stdout.write(section[a + 4:b + 1])
    return 0


if __name__ == "__main__":
    sys.exit(main())
