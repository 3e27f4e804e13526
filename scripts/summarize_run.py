#!/usr/bin/env python
"""Summarize a PILCO driver log into a markdown evidence table.

Parses the `episode N metrics: {...}` lines the loops/driver.py logger emits
and prints a per-episode reward/eReward/vReward/vSuccess/fallback table plus
the phase totals, ready to paste into docs/perf_notes.md.

Usage: python scripts/summarize_run.py /tmp/queue_r3/pw_evidence.log [...]
"""
from __future__ import annotations

import re
import sys

_EVAL_NAMES = {
    "__builtins__": {},
    "nan": float("nan"),
    "inf": float("inf"),
    "True": True,
    "False": False,
}


def _parse(s: str):
    """Parse a repr'd metrics dict; tolerates nan/inf (ast.literal_eval doesn't)."""
    return eval(s, _EVAL_NAMES)  # noqa: S307 - our own log lines

EP_RE = re.compile(r"episode (\d+) metrics: (\{.*?\}) timings: (\{.*?\})$")
TOTALS_RE = re.compile(r"phase totals: (.*)$")


def summarize(path: str) -> str:
    episodes, totals = {}, None
    with open(path, errors="replace") as f:
        for line in f:
            m = EP_RE.search(line)
            if m:
                # latest occurrence wins (stall-restarts replay earlier episodes)
                episodes[int(m.group(1))] = (
                    _parse(m.group(2)),
                    _parse(m.group(3)),
                )
            m = TOTALS_RE.search(line)
            if m:
                totals = m.group(1)
    out = [f"### {path}", ""]
    out.append("| ep | reward | success | eReward | vReward | vSuccess | fallback | dyn | pol |")
    out.append("|---|---|---|---|---|---|---|---|---|")

    def fmt(v):
        if v is None:
            return "-"
        if isinstance(v, bool):
            return "Y" if v else "n"
        if isinstance(v, float):
            return f"{v:.2f}"
        return str(v)

    for ep in sorted(episodes):
        met, tim = episodes[ep]
        out.append(
            "| {} | {} | {} | {} | {} | {} | {} | {} | {} |".format(
                ep,
                fmt(met.get("rewards")),
                fmt(met.get("success")),
                fmt(met.get("eReward")),
                fmt(met.get("vReward")),
                fmt(met.get("vSuccess")),
                fmt(met.get("fallback")),
                tim.get("dynamics_s", "-"),
                tim.get("policy_s", "-"),
            )
        )
    if totals:
        out += ["", f"phase totals: {totals}"]
    solved = [
        ep for ep, (met, _) in sorted(episodes.items())
        if (met.get("vSuccess") or 0) >= 0.9
    ]
    if solved:
        first = solved[0]
        later = [ep for ep in episodes if ep > first]
        held = all((episodes[ep][0].get("vSuccess") or 0) >= 0.9 for ep in later)
        out += ["", f"first solve (vSuccess>=0.9): ep {first}; "
                    f"held after solve: {'YES' if held else 'NO'}"]
    else:
        out += ["", "no episode reached vSuccess>=0.9"]
    return "\n".join(out)


if __name__ == "__main__":
    for p in sys.argv[1:]:
        print(summarize(p))
        print()
