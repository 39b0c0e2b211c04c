"""Render a tools/PERP_TABLE*.txt into the README markdown table.

Usage: python tools/mk_readme_table.py [tools/PERP_TABLE.txt]

Parses the last complete table in the file (a regenerated file may hold
several runs) and prints markdown rows with both roofline fractions.
Older tables without the frac_str column get it recomputed analytically
from the config line's bandwidth and the streamed-traffic model
(state at dtype + Z-planes + P + geometry stream).
"""

from __future__ import annotations

import re
import sys

LADDER_CELLS = {p: 2 ** s for p, s in
                {1: 17, 2: 15, 3: 14, 4: 13, 5: 12, 6: 12, 7: 11, 8: 11,
                 9: 10, 10: 10, 11: 10}.items()}


def stream_bytes_per_cell(p: int, word: float, geom_words_cell: float
                          ) -> float:
    q = p + 2
    return (3 * p ** 3 * (16 + 4 * word)      # x,g r+w f32; d,h r+w word
            + 3 * p ** 2 * (8 + 4 * word)     # zg f32; zd,zh word (r+w)
            + word * p ** 3                   # P read
            + 4 * geom_words_cell)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "tools/PERP_TABLE.txt"
    text = open(path).read()
    header = [m for m in re.finditer(r"# per-degree roofline table.*", text)]
    if not header:
        raise SystemExit("no table header found")
    block = text[header[-1].start():]
    bw = float(re.search(r"bw=(\d+) GB/s", block).group(1)) * 1e9
    dtype = re.search(r"dtype=(\w+)", block)
    word = 2.0 if (dtype and dtype.group(1) == "bf16") else 4.0
    geom = re.search(r"geometry=(\w+)", block)
    has_fracstr = "frac_str" in block.splitlines()[1]
    print("| p | n_dofs | time/it | GDoF/s/it | frac9 | frac_str | "
          "time/matvec |")
    print("|---|--------|---------|-----------|------|------|------|")
    for line in block.splitlines():
        m = re.match(r"\s+(\d+) \|\s+(\d+) \|\s+(\d+) \|"
                     r"\s+([\d.]+) \|\s+([\d.]+) \|\s+([\d.]+) \|"
                     r"(?:\s+([\d.]+) \|)?"
                     r"\s+([\d.]+) \|\s+([\d.]+) \|\s+([\d.]+) \| (\d+)",
                     line)
        if not m:
            continue
        p, s, nd = int(m.group(1)), int(m.group(2)), int(m.group(3))
        t_it, g_s, frac9 = (float(m.group(4)), float(m.group(5)),
                            float(m.group(6)))
        if has_fracstr and m.group(7) is not None:
            frac_str = float(m.group(7))
            t_mv = float(m.group(8))
        else:
            q = p + 2
            gwords = (24.0 if (geom and geom.group(1) == "onthefly"
                               and q ** 3 % 8 == 0) else 6.0 * q ** 3)
            by = stream_bytes_per_cell(p, word, gwords) * (2 ** s)
            frac_str = (by / bw) / (t_it * 1e-6)
            t_mv = float(m.group(8))
        print(f"| {p} | {nd:,} | {t_it:.0f} us | {g_s:.2f} G | "
              f"{frac9:.3f} | {frac_str:.2f} | {t_mv:.0f} us |")


if __name__ == "__main__":
    main()
