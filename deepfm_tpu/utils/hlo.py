"""Compiled-HLO inspection helpers.

Used by the scaling/measurement harnesses: on a virtual CPU mesh,
wall-clock is noise, but the compiled program's collective inventory —
which collectives run, how many, and how many bytes each moves — is
exact and hardware-independent. These helpers parse the optimized HLO
text of a compiled jit function.
"""

from __future__ import annotations

import re

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "s32": 4, "u64": 8, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}

COLLECTIVES = (
    "all-to-all", "all-reduce", "all-gather", "reduce-scatter",
    "collective-permute",
)

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def _match_collective(line: str):
    """(base_op, counts) for a collective INSTRUCTION on this line.

    Matches the opcode position (followed by its operand paren), so
    variable names like ``%all-gather-start.1 =`` and operand
    references inside parens don't trigger. Async pairs count once, at
    the ``-start`` op; ``-done`` is recognized but not counted.
    """
    for op in COLLECTIVES:
        m = re.search(rf"[\s]({re.escape(op)}(?:-start|-done)?)\(", line)
        if m:
            return op, not m.group(1).endswith("-done")
    return None


def _shape_bytes(dtype: str, dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dtype, 4)


def op_output_bytes(line: str) -> int:
    """Bytes of the RESULT shape(s) on an HLO instruction line.

    Parses only the region between ``=`` and the opcode call (operand
    positions also print shapes in full HLO text). Handles the two
    tuple-result cases TPU-compiled programs emit:

      * async ``-start`` ops return ``(operand_alias, result, ...)`` —
        the second tuple element is the result, the first is just an
        alias of the input, so count element [1];
      * tuple-returning sync ``all-to-all`` (one array per split
        operand) — total traffic is the SUM of the tuple elements.
    """
    eq = line.find("=")
    if eq < 0:
        return 0
    m_op = re.search(r"\s([a-z0-9\-]+)\(", line[eq:])
    region = line[eq : eq + m_op.start()] if m_op else line[eq:]
    shapes = _SHAPE_RE.findall(region)
    if not shapes:
        return 0
    if "-start(" in line and len(shapes) >= 2:
        return _shape_bytes(*shapes[1])
    return sum(_shape_bytes(dt, dims) for dt, dims in shapes)


def collective_inventory(hlo: str) -> dict:
    """Collective op -> (count, bytes), split "main" vs "conditional".

    Conditional-branch computations (e.g. the all_to_all overflow
    fallback) are bucketed separately: they exist in the program but do
    not execute on the common path.
    """
    cond_comps = set()
    for m in re.finditer(
        r"(?:true_computation|false_computation|branch_computations)="
        r"\{?([%\w.\-, ]+)\}?", hlo
    ):
        for name in m.group(1).split(","):
            cond_comps.add(name.strip().lstrip("%"))

    inv = {"main": {}, "conditional": {}}
    current = None
    in_cond = False
    for line in hlo.splitlines():
        if line and not line[0].isspace() and ("{" in line):
            cm = re.match(r"(?:ENTRY\s+)?%?([\w.\-]+)", line.strip())
            if cm:
                current = cm.group(1)
                in_cond = current in cond_comps
        hit = _match_collective(line)
        if hit is not None:
            op, counts = hit
            if counts:
                b = op_output_bytes(line)
                bucket = inv["conditional" if in_cond else "main"]
                c, tot = bucket.get(op, (0, 0))
                bucket[op] = (c + 1, tot + b)
    return inv


def collective_totals(hlo: str) -> dict:
    """Flat summary: {"main_bytes": N, "main_count": N,
    "conditional_bytes": N, "ops": {op: bytes}} for the main path."""
    inv = collective_inventory(hlo)
    return {
        "main_bytes": sum(b for _, b in inv["main"].values()),
        "main_count": sum(c for c, _ in inv["main"].values()),
        "conditional_bytes": sum(
            b for _, b in inv["conditional"].values()
        ),
        "ops": {op: b for op, (c, b) in sorted(inv["main"].items())},
    }
