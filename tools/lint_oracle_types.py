#!/usr/bin/env python3
"""Deep oracle type lint (dev tooling; the r10 enforcement of the
house HUGEINT rule — see BASELINE.md "oracle portability").

The r9 incident: DuckDB `//` with ANY HUGEINT operand is resolved
differently by the driver's DuckDB build than by the local 1.0.0, and
a sum()-born HUGEINT stays HUGEINT through every downstream CTE alias
— so a type-blind grep cannot enforce the rule. This lint asks DuckDB
itself:

  1. output level: DESCRIBE the full oracle — no HUGEINT column may
     reach the result (stricter than the driver, which tolerates
     emitted-but-never-divided HUGEINT);
  2. CTE level, for any oracle whose SQL contains `//`: split the
     WITH-clause with a paren-depth scan, DESCRIBE
     `WITH <all CTEs> SELECT * FROM <cte>` for every CTE, and flag any
     HUGEINT column in any intermediate frame — the frame a `//` or an
     integer comparison could read from.

Usage: python3 tools/lint_oracle_types.py <oracle_sql.json> <sf_dir>
Exit 1 if any oracle is flagged.
"""
import json, os, re, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# CTEs that legitimately carry HUGEINT: mod-2^N hash/rng state whose
# intermediate PRODUCTS overflow int64 (the state itself is reduced
# back below 2^64 each step and is CAST to BIGINT before any `//` or
# emission — audited in the query's own comments). Everything else
# must cast sum()-aggregates to BIGINT at birth.
ALLOWED_HUGEINT_CTES = {
    "q50_dedup_cdc_chunks": {
        "gear": "256 inlined mod-2^64 gear constants",
        "bytes": "gear constant joined per byte (mod-2^64 domain)",
        "walk": "rolling Gear hash state, mod-2^64",
    },
    "q58_image_neardup": {
        "st": "java.util.Random LCG state: 83-bit product before mod 2^48",
    },
    "q181_audio_neardup": {
        "st": "java.util.Random LCG state: 83-bit product before mod 2^48"
              " (q58's generator, audio corpus)",
    },
    "q237_binaryfile_ingest": {
        "st": "java.util.Random LCG state: 83-bit product before mod 2^48"
              " (carries q58's oracle VERBATIM - same allowlisted CTE)",
    },
}


def split_ctes(sql):
    """Return (list of (name, is_recursive_block), cte_list_text) for
    the top-level WITH clause, or ([], None) if there is none. Works on
    the generated oracle SQL (no quoted identifiers, no strings
    containing unbalanced parens — both true for this catalog)."""
    m = re.search(r"\bWITH\b(\s+RECURSIVE\b)?", sql, re.IGNORECASE)
    if not m:
        return [], None
    i = m.end()
    names = []
    depth = 0
    start = i
    while i < len(sql):
        c = sql[i]
        if c == "'":  # skip string literals ('' inside is an escaped quote)
            i += 1
            while i < len(sql):
                if sql[i] == "'":
                    if i + 1 < len(sql) and sql[i + 1] == "'":
                        i += 2  # doubled quote: still inside the literal
                        continue
                    break  # true closing quote
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                # end of one CTE body; next is ',' (another CTE) or the
                # final SELECT
                j = i + 1
                while j < len(sql) and sql[j].isspace():
                    j += 1
                if j < len(sql) and sql[j] == ",":
                    i = j
                else:
                    return names, sql[start:i + 1]
        elif depth == 0 and c.isalpha():
            nm = re.match(r"(\w+)\s*(\([^)]*\))?\s+AS\s+(MATERIALIZED\s+)?\(",
                          sql[i:], re.IGNORECASE)
            if nm:
                names.append(nm.group(1))
                i += nm.end() - 1  # lands on the '(' -> depth++ next
                depth += 1
        i += 1
    return names, sql[start:]


def main(oracle_path, sfdir):
    con = duckdb.connect()
    con.execute("SET enable_progress_bar=false")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))
    n_flag = 0
    for name, sql in sorted(oracle.items()):
        errs = []
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"FLAG {name}: describe error: {str(e)[:120]}")
            n_flag += 1
            continue
        hug = [r[0] for r in desc if "HUGEINT" in r[1].upper()]
        if hug:
            errs.append(f"output HUGEINT cols {hug}")
        if "//" in sql:
            names, cte_text = split_ctes(sql)
            rec = "RECURSIVE " if re.search(
                r"\bWITH\s+RECURSIVE\b", sql, re.IGNORECASE) else ""
            for cte in names:
                probe = f"WITH {rec}{cte_text} SELECT * FROM {cte}"
                try:
                    cdesc = con.execute(f"DESCRIBE {probe}").fetchall()
                except Exception:
                    continue  # recursive/self-referencing edge: skip
                chug = [r[0] for r in cdesc if "HUGEINT" in r[1].upper()]
                if chug and cte not in ALLOWED_HUGEINT_CTES.get(name, {}):
                    errs.append(f"CTE {cte} HUGEINT cols {chug}")
        if errs:
            print(f"FLAG {name}: " + "; ".join(errs))
            n_flag += 1
        else:
            print(f"ok   {name}")
    print(f"\n{len(oracle) - n_flag} clean / {n_flag} flagged")
    return 1 if n_flag else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
