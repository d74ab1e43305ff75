"""Join a jax.profiler trace with an HLO text dump: per-op device time
attributed to source file:line.

Usage:
    python tools/trace_attrib.py /tmp/ab/base0 /tmp/hlo_r4/adam_1024.hlo.txt \
        [--iters 60] [--min-ms 0.05] [--by-line]

For every TensorCore op event in the newest ``*.trace.json.gz`` under the
trace root, looks up the op's ``metadata={... source_file=... source_line=*}``
in the HLO dump and prints the per-iteration cost ranked table with the
attributed source location and the op's output shape.  ``--by-line``
aggregates by source location instead of per op.

This is the round-4 instrument used to decide which source lines to attack
for step-time cuts (see PERF.md).
"""

from __future__ import annotations

import argparse
import collections
import re

from trace_ops import load_trace


_META_RE = re.compile(
    r'source_file="(?P<file>[^"]+)" source_line=(?P<line>\d+)'
)
_OPNAME_RE = re.compile(r'op_name="(?P<op>[^"]+)"')


def parse_hlo(path: str) -> dict:
    """op name -> (shape, source, op_name) from an HLO text dump."""
    table: dict[str, tuple[str, str, str]] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("%") or " = " not in line:
                continue
            name, rhs = line[1:].split(" = ", 1)
            meta = _META_RE.search(line)
            src = f"{meta.group('file').split('/')[-1]}:{meta.group('line')}" if meta else "?"
            opn = _OPNAME_RE.search(line)
            op = opn.group("op") if opn else ""
            # keep the jax primitive tail of the op_name (most informative)
            op = "/".join(op.split("/")[-2:]) if op else ""
            # shape: strip layout annotations from the leading type token(s)
            head = rhs.split(" {")[0]
            if head.startswith("("):  # tuple shape: cut at the closing paren
                shape = head[: head.find(") ") + 1] if ") " in head else head
            else:
                shape = head.split(" ")[0]
            shape = re.sub(r"\{[^}]*\}", "", shape)
            table[name] = (shape, src, op)
    return table


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_root")
    ap.add_argument("hlo")
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--min-ms", type=float, default=0.05, help="per-iter cutoff")
    ap.add_argument("--by-line", action="store_true")
    args = ap.parse_args()

    hlo = parse_hlo(args.hlo)
    data = load_trace(args.trace_root)
    events = data["traceEvents"]
    pnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
    keep = {p for p, n in pnames.items() if "tpu" in n.lower()}
    if not keep:
        keep = {p for p, n in pnames.items() if "python" not in n.lower()}

    durs: dict[str, float] = collections.defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in keep:
            continue
        name = e.get("name", "")
        if name.startswith("while") or name.startswith("jit_") or name == "0":
            continue
        durs[name] += e.get("dur", 0) / 1e3

    rows = []
    for name, ms in durs.items():
        per_iter = ms / args.iters
        if per_iter < args.min_ms:
            continue
        shape, src, op = hlo.get(name, ("?", "?", ""))
        rows.append((per_iter, name, shape, src, op))

    if args.by_line:
        agg: dict[str, float] = collections.defaultdict(float)
        for per_iter, _, _, src, _ in rows:
            agg[src] += per_iter
        print(f"{'ms/iter':>8}  source")
        for src, ms in sorted(agg.items(), key=lambda kv: -kv[1]):
            print(f"{ms:8.3f}  {src}")
        print(f"{sum(agg.values()):8.3f}  TOTAL (>= {args.min_ms} ms ops)")
        return

    rows.sort(reverse=True)
    print(f"{'ms/iter':>8}  {'op':<28} {'shape':<36} {'source':<22} jax op")
    for per_iter, name, shape, src, op in rows:
        print(f"{per_iter:8.3f}  {name:<28} {shape:<36} {src:<22} {op}")
    print(f"{sum(r[0] for r in rows):8.3f}  TOTAL (>= {args.min_ms} ms ops)")


if __name__ == "__main__":
    main()
