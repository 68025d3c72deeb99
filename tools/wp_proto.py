#!/usr/bin/env python3
"""Prototype of the WordPiece training-unroll oracle (development aid;
the shipped generator is sql/WordPieceSql.scala — keep the two in sync)."""
import sys
import duckdb

TOKS = "list_filter(string_split_regex(trim(text), ' +'), x -> x <> '')"


def train_ctes(table: str, rounds: int) -> str:
    ctes = [
        f"w0 AS MATERIALIZED (SELECT unnest({TOKS}) AS word FROM {table} WHERE text IS NOT NULL)",
        "wcnt AS MATERIALIZED (SELECT word, COUNT(*) AS wc FROM w0 GROUP BY word)",
        ("s0 AS MATERIALIZED (SELECT word, wc, "
         "list_transform(range(1, length(word) + 1), i -> "
         "CASE WHEN i = 1 THEN word[CAST(i AS INT)] "
         "ELSE '##' || word[CAST(i AS INT)] END) AS sy FROM wcnt)"),
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"sc{r} AS MATERIALIZED (SELECT sy[CAST(i AS INT)] AS sym, SUM(wc) AS c FROM "
            f"(SELECT sy, wc, unnest(range(1, len(sy) + 1)) AS i FROM s{p}) GROUP BY sym)")
        ctes.append(
            f"p{r} AS MATERIALIZED (SELECT sy[CAST(i AS INT)] AS l, sy[CAST(i + 1 AS INT)] AS r, "
            f"SUM(wc) AS c FROM (SELECT sy, wc, unnest(range(1, len(sy))) AS i "
            f"FROM s{p} WHERE len(sy) >= 2) GROUP BY l, r)")
        ctes.append(
            f"b{r} AS MATERIALIZED (SELECT l, r, l || (CASE WHEN r LIKE '##%' "
            f"THEN substr(r, 3) ELSE r END) AS m FROM "
            f"(SELECT p.l, p.r, (p.c * 1000000000000) // (cl.c * cr.c) AS score "
            f"FROM p{r} p JOIN sc{r} cl ON cl.sym = p.l JOIN sc{r} cr ON cr.sym = p.r "
            f"ORDER BY score DESC, p.l ASC, p.r ASC LIMIT 1))")
        ctes.append(
            f"rw{r}(word, wc, sy, i, out) AS ("
            f"SELECT word, wc, sy, 1, CAST([] AS VARCHAR[]) FROM s{p} "
            f"UNION ALL "
            f"SELECT t.word, t.wc, t.sy, "
            f"CASE WHEN t.sy[CAST(t.i AS INT)] = b.l AND t.sy[CAST(t.i + 1 AS INT)] = b.r "
            f"THEN t.i + 2 ELSE t.i + 1 END, "
            f"list_append(t.out, CASE WHEN t.sy[CAST(t.i AS INT)] = b.l "
            f"AND t.sy[CAST(t.i + 1 AS INT)] = b.r THEN b.m ELSE t.sy[CAST(t.i AS INT)] END) "
            f"FROM rw{r} t, b{r} b WHERE t.i <= len(t.sy))")
        ctes.append(
            f"s{r} AS MATERIALIZED (SELECT word, wc, out AS sy FROM rw{r} WHERE i > len(sy))")
    return "WITH RECURSIVE " + ",\n".join(ctes)


def fertility_sql(table: str, group_col: str, rounds: int) -> str:
    return f"""{train_ctes(table, rounds)},
d AS (SELECT {group_col}, doc_id, {TOKS} AS tk FROM {table} WHERE text IS NOT NULL),
w1 AS (SELECT doc_id, unnest(tk) AS word FROM d),
enc AS (SELECT doc_id, length(word) AS nc, len(s.sy) AS nt
  FROM w1 JOIN s{rounds} s USING (word)),
pd AS (SELECT doc_id, COUNT(*) AS nw, SUM(nc) AS nc, SUM(nt) AS nt FROM enc GROUP BY 1),
pda AS (SELECT d.{group_col}, COALESCE(p.nw, 0) AS nw, COALESCE(p.nc, 0) AS nc,
  COALESCE(p.nt, 0) AS nt FROM d LEFT JOIN pd p USING (doc_id))
SELECT {group_col}, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(nw) AS BIGINT) AS n_words, CAST(SUM(nc) AS BIGINT) AS n_chars,
  CAST(SUM(nt) AS BIGINT) AS n_wp_tokens,
  CASE WHEN SUM(nw) > 0 THEN CAST((SUM(nt) * 1000000) // SUM(nw) AS BIGINT) END AS tokens_per_word_ppm,
  CASE WHEN SUM(nt) > 0 THEN CAST((SUM(nc) * 1000000) // SUM(nt) AS BIGINT) END AS chars_per_token_ppm
FROM pda GROUP BY {group_col} ORDER BY {group_col}"""


def merges_sql(table: str, rounds: int) -> str:
    sel = " UNION ALL ".join(
        f"SELECT {r} AS round, l AS left_sym, r AS right_sym, m AS merged_sym FROM b{r}"
        for r in range(1, rounds + 1))
    return f"{train_ctes(table, rounds)},\nmm AS ({sel})\nSELECT * FROM mm ORDER BY round"


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
    import time
    t0 = time.time()
    print("merges:")
    for row in con.execute(merges_sql("documents", rounds)).fetchall():
        print(" ", row)
    print("fertility:")
    for row in con.execute(fertility_sql("documents", "lang", rounds)).fetchall():
        print(" ", row)
    print(f"({time.time() - t0:.1f}s)")
