"""Executed-op accounting for compiled XLA programs.

The training program is a scan-of-scans; XLA lowers each ``lax.scan`` to a
``while`` whose body executes once per iteration, so ``cost_analysis``-style
whole-module numbers undercount by epochs x batches.  These helpers parse
the optimized HLO text (``compiled.as_text()``), walk the while-loop nest,
and count REAL instructions per body — fusions, dots, convolutions,
custom-calls — excluding parameter/tuple/gte plumbing that lowers to
nothing.  Multiplying by the statically-known trip counts gives the exact
per-epoch device-op count, the basis of ``bench.py``'s op-bound roofline.
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

_INST = re.compile(r"^\s*(ROOT\s+)?%?[\w.\-]+\s*=")
#: opcodes that lower to no scheduled device work (plumbing)
_PLUMBING = {
    "parameter", "constant", "get-tuple-element", "tuple", "bitcast",
    "copy-done", "after-all", "add-dependency",
}
# The opcode is the identifier directly before the operand list "(%..." or
# "()"; matching on the result TYPE is unreliable — tuple-typed results
# contain spaces and nested parens (e.g. "(f32[32]{0:T(128)}, ...)").
_OPCODE = re.compile(r"=\s*(?:.*?\s)?([a-z][\w\-]*)\((?=%|\)|[a-z0-9])")


def opcode(line: str) -> Optional[str]:
    """The HLO opcode of an instruction line (None if unparseable)."""
    m = _OPCODE.search(line.split(", metadata=")[0])
    return m.group(1) if m else None


def parse_computations(hlo_text: str) -> Tuple[Dict[str, List[str]], Optional[str]]:
    """(computation name -> instruction lines, entry computation name)."""
    comps: Dict[str, List[str]] = {}
    entry = None
    cur: Optional[str] = None
    lines: List[str] = []
    for line in hlo_text.splitlines():
        head = line
        is_entry = head.startswith("ENTRY ")
        if is_entry:
            head = head[len("ENTRY "):]
        m = re.match(r"^(%?[\w.\-]+)\s*\(.*{\s*$", head)
        if m and not _INST.match(head):
            cur, lines = m.group(1).lstrip("%"), []
            comps[cur] = lines
            if is_entry:
                entry = cur
            continue
        if line.startswith("}"):
            cur = None
            continue
        if cur is not None and _INST.match(line):
            lines.append(line)
    return comps, entry


def real_ops(lines: List[str]) -> List[str]:
    """Instructions that lower to scheduled device work."""
    return [l for l in lines if opcode(l) not in _PLUMBING]


def find_whiles(lines: List[str]) -> List[str]:
    """Body computation names of each while instruction.  (A scan-lowered
    while's result type is a TUPLE containing spaces, so match on the
    ``while(`` keyword, not a space-free type token.)"""
    out = []
    for l in lines:
        if " while(" in l:
            b = re.search(r"body=%?([\w.\-]+)", l)
            if b:
                out.append(b.group(1))
    return out


def scan_nest_op_counts(hlo_text: str) -> dict:
    """Op counts of the entry / outer-while body / inner-while body of a
    scan-of-scans training program.  Returns a dict with ``entry_ops``,
    ``epoch_body_ops`` (outer while body), ``batch_body_ops`` (first inner
    while body, 0 if the epoch body has no inner scan)."""
    comps, entry = parse_computations(hlo_text)
    if entry is None:
        raise ValueError("no ENTRY computation found in HLO text")
    entry_ops = len(real_ops(comps[entry]))
    outers = find_whiles(comps[entry])
    if not outers:
        return {"entry_ops": entry_ops, "epoch_body_ops": 0,
                "batch_body_ops": 0}
    outer = outers[0]
    epoch_body_ops = len(real_ops(comps[outer]))
    inners = find_whiles(comps[outer])
    batch_body_ops = len(real_ops(comps[inners[0]])) if inners else 0
    return {"entry_ops": entry_ops, "epoch_body_ops": epoch_body_ops,
            "batch_body_ops": batch_body_ops}
