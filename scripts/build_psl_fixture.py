"""Build data/psl.parquet — the real Mozilla Public Suffix List as the
registrable-domain operator's data dimension.

Source: the PSL snapshot Debian ships at
/usr/share/publicsuffix/public_suffix_list.dat (the same public data as
https://publicsuffix.org/list/public_suffix_list.dat; MPL-2.0). The
operator is data-driven — this script is a one-time data bake, not a
build step: the parquet is committed, and refreshing the list is a
re-run against a newer .dat.

Row model (one row per rule, plus an ASCII punycode alias row for each
IDN rule so hosts match in either form):

  key       join key as the matcher generates it from host labels:
            the literal suffix, '*.'+tail for wildcard rules, or the
            exception's own labels (marker stripped)
  n_labels  label count of the rule ('*' counts as one label)
  kind      0 = normal (literal or wildcard), 1 = exception (!rule)
  rule      the rule as written in the source file
  section   'icann' | 'private'

Usage: python scripts/build_psl_fixture.py [src.dat] [out.parquet]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DEFAULT_SRC = "/usr/share/publicsuffix/public_suffix_list.dat"
DEFAULT_OUT = REPO / "data" / "psl.parquet"


def parse_rule(rule: str) -> tuple[str, int, int]:
    """(key, n_labels, kind) for one PSL rule, the same closed form the
    matcher uses (hash_db_spark.operators.web generates candidate keys
    with identical shapes: exact last-k-labels and '*.'+last-(k-1))."""
    if rule.startswith("!"):
        base = rule[1:]
        return base, base.count(".") + 1, 1
    return rule, rule.count(".") + 1, 0


def punycode_key(key: str) -> str | None:
    """ASCII (xn--) form of a rule key, label by label ('*' passes
    through); None when unchanged or not encodable."""
    if key.isascii():
        return None
    out = []
    for lab in key.split("."):
        if lab == "*" or lab.isascii():
            out.append(lab)
            continue
        try:
            out.append("xn--" + lab.encode("punycode").decode("ascii"))
        except UnicodeError:
            return None
    return ".".join(out)


def build_rows(src: Path) -> list[tuple[str, int, int, str, str]]:
    rows: list[tuple[str, int, int, str, str]] = []
    section = "icann"
    for raw in src.read_text(encoding="utf-8").splitlines():
        line = raw.strip()
        if not line:
            continue
        if line.startswith("//"):
            if "===BEGIN ICANN DOMAINS===" in line:
                section = "icann"
            elif "===BEGIN PRIVATE DOMAINS===" in line:
                section = "private"
            continue
        rule = line.split()[0].lower()
        key, n_labels, kind = parse_rule(rule)
        rows.append((key, n_labels, kind, rule, section))
        alias = punycode_key(key)
        if alias is not None:
            rows.append((alias, n_labels, kind, rule, section))
    return rows


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(DEFAULT_SRC)
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else DEFAULT_OUT
    rows = sorted(set(build_rows(src)))
    out.parent.mkdir(parents=True, exist_ok=True)
    table = pa.table(
        {
            "key": pa.array([r[0] for r in rows], pa.string()),
            "n_labels": pa.array([r[1] for r in rows], pa.int32()),
            "kind": pa.array([r[2] for r in rows], pa.int32()),
            "rule": pa.array([r[3] for r in rows], pa.string()),
            "section": pa.array([r[4] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, out, compression="zstd")
    n_wild = sum(r[0].startswith("*.") for r in rows)
    n_exc = sum(r[2] == 1 for r in rows)
    max_depth = max(r[1] for r in rows)
    print(
        f"wrote {out}: {len(rows)} rows "
        f"({n_wild} wildcard, {n_exc} exception, max depth {max_depth})"
    )


if __name__ == "__main__":
    main()
