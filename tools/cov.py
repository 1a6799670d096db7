"""Line coverage for the test suite without third-party packages.

This image has no coverage/pytest-cov; Python 3.12's sys.monitoring gives
first-hit line events with near-zero steady-state overhead (each (code,
line) event is DISABLEd after its first hit), which is exactly the
granularity line coverage needs.

Run:
    python tools/cov.py -m pytest tests/ -q          # collect -> /tmp/libzl_cov.json
    python tools/cov.py --report [--min N] [files…]  # per-file table + missing lines

Executable lines are derived from the AST (statement linenos), so the
denominator ignores blanks/comments/docstrings. Subprocess-driven tests
(test_capi, test_examples) exercise code in children; their lines are NOT
collected here — treat their modules' numbers as lower bounds.
"""

from __future__ import annotations

import ast
import json
import os
import runpy
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PKG = REPO / "libzl_tpu"
OUT = Path(os.environ.get("LIBZL_TPU_COV_OUT", "/tmp/libzl_cov.json"))

TOOL_ID = 3  # sys.monitoring tool slot (0=debugger, 1=coverage by convention)


def _collect(argv: list[str]) -> None:
    # `python -m pytest` puts CWD first on sys.path; `python tools/cov.py`
    # puts tools/ there instead — restore the repo root so libzl_tpu imports
    sys.path.insert(0, str(REPO))
    mon = sys.monitoring
    mon.use_tool_id(TOOL_ID, "libzl-cov")
    pkg_prefix = str(PKG) + os.sep
    hits: dict[str, set[int]] = {}

    def on_line(code, line):
        fn = code.co_filename
        if fn.startswith(pkg_prefix):
            hits.setdefault(fn, set()).add(line)
        return mon.DISABLE  # first hit is all coverage needs

    mon.register_callback(TOOL_ID, mon.events.LINE, on_line)
    mon.set_events(TOOL_ID, mon.events.LINE)
    try:
        if argv and argv[0] == "-m":
            sys.argv = argv[1:]
            runpy.run_module(argv[1], run_name="__main__", alter_sys=True)
        else:
            sys.argv = argv
            runpy.run_path(argv[0], run_name="__main__")
    except SystemExit:
        pass
    finally:
        mon.set_events(TOOL_ID, 0)
        OUT.write_text(json.dumps({f: sorted(v) for f, v in hits.items()}))
        sys.stderr.write(f"[cov] wrote {OUT} ({len(hits)} files)\n")


def _executable_lines(path: Path) -> set[int]:
    """Statement start lines per the AST — the lines the interpreter can
    actually emit LINE events for (minus a few compile-time constants)."""
    tree = ast.parse(path.read_text(), filename=str(path))
    lines: set[int] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.stmt):
            # a docstring-expression statement never fires a LINE event
            if (isinstance(node, ast.Expr)
                    and isinstance(node.value, ast.Constant)
                    and isinstance(node.value.value, str)):
                continue
            lines.add(node.lineno)
            # decorated defs report the def line at runtime, decorators too
            for dec in getattr(node, "decorator_list", []):
                lines.add(dec.lineno)
    return lines


def _report(args: list[str]) -> None:
    min_pct = 0.0
    show: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--min":
            min_pct = float(next(it))
        else:
            show.append(a)
    hits = {Path(f): set(v) for f, v in json.loads(OUT.read_text()).items()}
    rows = []
    tot_exec = tot_hit = 0
    for path in sorted(PKG.rglob("*.py")):
        ex = _executable_lines(path)
        if not ex:
            continue
        got = hits.get(path, set()) & ex
        missing = sorted(ex - got)
        pct = 100.0 * len(got) / len(ex)
        tot_exec += len(ex)
        tot_hit += len(got)
        rows.append((pct, path.relative_to(REPO), len(ex), missing))
    rows.sort()
    for pct, rel, n, missing in rows:
        if pct * (1 if min_pct else 0) >= min_pct and min_pct and pct >= min_pct:
            continue
        mark = "" if not show else (" <--" if any(s in str(rel) for s in show) else "")
        print(f"{pct:6.1f}%  {rel}  ({n} stmts){mark}")
        if show and any(s in str(rel) for s in show):
            print(f"        missing: {_ranges(missing)}")
    print(f"\nTOTAL {100.0 * tot_hit / max(tot_exec, 1):.1f}% "
          f"({tot_hit}/{tot_exec} executable lines)")


def _ranges(lines: list[int]) -> str:
    if not lines:
        return "-"
    out, start, prev = [], lines[0], lines[0]
    for x in lines[1:]:
        if x == prev + 1:
            prev = x
            continue
        out.append(f"{start}-{prev}" if prev > start else str(start))
        start = prev = x
    out.append(f"{start}-{prev}" if prev > start else str(start))
    return ",".join(out)


if __name__ == "__main__":
    argv = sys.argv[1:]
    if argv and argv[0] == "--report":
        _report(argv[1:])
    else:
        _collect(argv)
