"""ClpString column search — clp_s's dictionary search over encoded JSON
string columns (the "mini-Grep").

clp_s stores string leaves that contain spaces as CLP-encoded columns with
per-column logtype/variable dictionaries, and answers KQL string
predicates on them dictionary-first, without decompressing the column
(clp_s/search/clp_search/Grep.cpp, Query.cpp, Output.cpp:20-189; golden
behavior tests/test-clp_s-search.cpp:169-193, e.g. ``msg: "*Abc123*"``).

Spark-first layout:

- :func:`encode_clpstring_columns` replaces each ClpString column with
  ``<col>__logtype_id / __encoded_vars / __var_types`` (parse once via
  encode_pipeline; raw strings dropped — storage parity with clp_s).
- :func:`search_clpstring_column` compiles a KQL string value with
  operators.search (``wrap=False``: clp_s matches the FULL value, no
  implicit stars — kql.cpp unquote_literal) and runs it on the renamed
  encoded columns; candidates flow through the same literal-isin /
  broadcast-semi-join machinery and the decode-verify residual stage.
- :func:`kql_filter_clps` routes KQL clauses: ``col: value`` over an
  encoded ClpString column becomes a dictionary search + key semi-join;
  all other clauses compile to Column predicates (operators.kql). Clauses
  combine at the top level with a single connective (all-AND chains
  intersect via successive semi-joins; all-OR chains union + dedup).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from clp_core_spark.operators import encode_pipeline, search
from clp_core_spark.operators.kql import (
    KqlCompiler,
    Tok,
    _descriptor_tokens,
    _lex,
    _match_tokens,
    _unescape,
    unescape_kql_value,
)

# columns encode_clpstring_columns adds per ClpString column — hidden from
# wildcard-key resolution (they are storage internals, not user leaves)
_SYNTH_SUFFIXES = ("logtype_id", "encoded_vars", "var_types", "n_vars", "present")

def encode_clpstring_columns(
    df: DataFrame, cols: list[str], key_cols: list[str]
) -> tuple[DataFrame, dict[str, tuple[DataFrame, DataFrame]]]:
    """CLP-encode each ClpString column in place: the raw string column is
    replaced by ``<col>__logtype_id/__encoded_vars/__var_types/__n_vars``
    plus ``<col>__present`` (records missing the leaf keep their row —
    clp_s would place them in a different schema table; here absence is a
    presence flag, and searches only ever match present rows).
    Returns (encoded_df, {col: (logtype_dict, var_dict)}).

    SINGLE-PASS: all k columns are tokenized in ONE scan of the corpus —
    the per-column parse UDFs sit in one projection, so Spark fuses them
    into a single ArrowEvalPython stage (each Arrow batch crosses the
    Python boundary once and feeds every column writer), mirroring clp_s
    parsing each record once into all column writers
    (clp_s/JsonParser.cpp:125-232, clp_s/ColumnWriter.hpp:104-163).
    Dictionary IDs are content hashes computed inline (zero resolve
    shuffle); logtype IDs attach via k broadcast joins on tiny dicts."""
    from clp_core_spark.functions.tokenizer import VT_DICT
    from clp_core_spark.operators import dictionaries

    out = df
    for c in cols:
        out = out.withColumn(f"{c}__present", F.col(c).isNotNull())
        # nulls become a real (empty) message so absent-leaf rows keep a
        # valid logtype and survive the dictionary join
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit("")))
    parsed = out.select(
        "*",
        *[
            encode_pipeline._parse_slim_udf(F.col(c)).alias(f"_p_{c}")
            for c in cols
        ],
    ).persist()

    dicts: dict[str, tuple[DataFrame, DataFrame]] = {}
    enc = parsed
    for c in cols:
        p = f"_p_{c}"
        sub = parsed.select(
            F.col(f"{p}.logtype").alias("logtype"),
            F.col(f"{p}.dict_strs").alias("dict_strs"),
        )
        lt = dictionaries.build_logtype_dict(sub)
        vd = dictionaries.build_var_dict_hash(sub)
        dicts[c] = (lt, vd)
        def _hash_swap(parsed_col):
            # bind via closure: zip_with requires an exactly-2-arg lambda
            def fn(v, t):
                return F.when(
                    t == F.lit(VT_DICT),
                    F.xxhash64(
                        F.element_at(
                            F.col(f"{parsed_col}.dict_strs"), (v + 1).cast("int")
                        )
                    ),
                ).otherwise(v)

            return fn

        enc = enc.withColumn(
            f"{c}__encoded_vars",
            F.zip_with(
                F.col(f"{p}.encoded"), F.col(f"{p}.var_types"), _hash_swap(p)
            ),
        ).withColumn(f"{c}__var_types", F.col(f"{p}.var_types")).withColumn(
            f"{c}__n_vars", F.size(F.col(f"{p}.var_types"))
        )
        lt_renamed = lt.select(
            F.col("logtype").alias(f"_lt_{c}"),
            F.col("logtype_id").alias(f"{c}__logtype_id"),
        )
        enc = enc.withColumn(f"_lt_{c}", F.col(f"{p}.logtype")).join(
            F.broadcast(lt_renamed), f"_lt_{c}"
        ).drop(f"_lt_{c}", c)
    return enc.drop(*[f"_p_{c}" for c in cols]), dicts


def search_clpstring_column(
    encoded: DataFrame,
    col: str,
    dicts: dict[str, tuple[DataFrame, DataFrame]],
    query: str,
    key_cols: list[str],
    ignore_case: bool = False,
    wrap: bool = False,
) -> DataFrame:
    """Rows of ``encoded`` whose ClpString column ``col`` matches the CLP
    wildcard ``query`` (full-value match by default, clp_s semantics).
    Runs entirely on the encoded representation; the wildcard-verify
    residue decodes only candidate rows."""
    lt, vd = dicts[col]
    view = encoded.filter(F.col(f"{col}__present")).select(
        *key_cols,
        F.col(f"{col}__logtype_id").alias("logtype_id"),
        F.col(f"{col}__encoded_vars").alias("encoded_vars"),
        F.col(f"{col}__var_types").alias("var_types"),
    )
    hits = search.search_text(
        view, lt, vd, query, key_cols, ignore_case=ignore_case, wrap=wrap
    )
    return encoded.join(hits.select(*key_cols), key_cols, "leftsemi")


def _split_top_level(kql: str) -> tuple[list[str], list[str]]:
    """Split a KQL string on depth-0 AND/OR keywords. Returns (clauses,
    connectives); len(connectives) == len(clauses) - 1."""
    toks = _lex(kql)
    depth = 0
    clauses: list[str] = []
    ops: list[str] = []
    seg_start = 0
    for t in toks:
        if t.kind == "punct" and t.text in "({":
            depth += 1
        elif t.kind == "punct" and t.text in ")}":
            depth -= 1
        elif (
            depth == 0
            and t.kind == "lit"
            and t.text.lower() in ("and", "or")
        ):
            clauses.append(kql[seg_start : t.start])
            ops.append(t.text.lower())
            seg_start = t.end
    clauses.append(kql[seg_start:])
    return clauses, ops


def _clp_clause(toks: list[Tok], clp_cols) -> tuple[str, str] | None:
    """If the clause is exactly ``col : value`` with col ClpString-encoded,
    return (col, kql-unescaped value) else None."""
    if (
        len(toks) == 3
        and toks[0].kind in ("lit", "quoted")
        and toks[1].kind == "punct"
        and toks[1].text == ":"
        and toks[2].kind in ("lit", "quoted")
    ):
        name = _unescape(toks[0].text)
        if name in clp_cols:
            return name, unescape_kql_value(toks[2].text)
    return None


def _wildcard_clause(toks: list[Tok]) -> tuple[tuple, Tok] | None:
    """``desc : value`` with wildcard tokens in the descriptor, or a bare
    value (clp_s's default-column search IS the pure-wildcard descriptor,
    SchemaMatch::populate_column_mapping pure-wildcard branch). Returns
    (descriptor tokens, value token) else None."""
    if (
        len(toks) == 3
        and toks[0].kind in ("lit", "quoted")
        and toks[1].kind == "punct"
        and toks[1].text == ":"
        and toks[2].kind in ("lit", "quoted")
    ):
        tokens = _descriptor_tokens(toks[0].text)
        if any(w for _, w in tokens):
            return tokens, toks[2]
        return None
    if len(toks) == 1 and toks[0].kind in ("lit", "quoted"):
        return (("*", True),), toks[0]
    return None


def _plain_view(encoded: DataFrame, clp_cols) -> DataFrame:
    """``encoded`` without the per-ClpString storage columns and
    schema_id — the schema wildcard keys resolve against."""
    hidden = {f"{c}__{s}" for c in clp_cols for s in _SYNTH_SUFFIXES}
    hidden.add("schema_id")
    return encoded.drop(*[c for c in encoded.columns if c in hidden])


def kql_filter_clps(
    encoded: DataFrame,
    kql: str,
    dicts: dict[str, tuple[DataFrame, DataFrame]],
    key_cols: list[str],
    array_cols: set[str] | None = None,
    ignore_case: bool = False,
) -> DataFrame:
    """KQL over a clp_s-lite table whose ClpString columns are CLP-encoded.
    ``col: value`` clauses on encoded columns run as dictionary searches
    (search-without-decompression); wildcard-key clauses (``a.*: v``,
    ``*: v``) and bare values resolve over plain leaves AND encoded
    ClpString columns, unioning hits (SchemaMatch descriptor expansion);
    everything else compiles to Column predicates. ``array_cols``:
    JSON-text unstructured-array columns (see KqlCompiler). Top-level
    connectives must be homogeneous (all AND or all OR) — parenthesize
    to mix. ``ignore_case`` lowers the dictionary-search comparisons on
    ClpString columns — clp_s's --ignore-case (search(1) surface); plain
    Column predicates keep KQL's case-sensitive semantics."""
    clauses, ops = _split_top_level(kql)
    if ops and len(set(ops)) > 1:
        raise ValueError(
            "mixed top-level AND/OR over ClpString clauses is ambiguous; "
            "parenthesize the KQL query"
        )

    def apply_clause(base: DataFrame, clause: str) -> DataFrame:
        toks = _lex(clause)
        negated = bool(toks) and toks[0].kind == "lit" and toks[0].text.lower() == "not"
        body = toks[1:] if negated else toks
        hit = _clp_clause(body, dicts)
        if hit is not None:
            col, value = hit
            matched = search_clpstring_column(
                base, col, dicts, value, key_cols, ignore_case=ignore_case
            )
            if not negated:
                return matched
            # clp_s NOT only ranges over records whose schema HAS the
            # column (absent-leaf records match no schema for it).
            return base.filter(F.col(f"{col}__present")).join(
                matched.select(*key_cols), key_cols, "left_anti"
            )
        # wildcard key (or bare value = pure wildcard): resolve over plain
        # leaves AND ClpString-encoded columns; hits union (SchemaMatch
        # expands the descriptor to an OR over concrete leaves)
        wild = _wildcard_clause(body) if not negated else None
        if wild is not None:
            tokens, val_tok = wild
            matched_clp = [
                c for c in dicts if _match_tokens(tokens, tuple(c.split("__")))
            ]
            if matched_clp:
                comp = KqlCompiler(
                    _plain_view(base, dicts), array_json_cols=array_cols
                )
                pred = comp.match_pred(tokens, val_tok)
                keys = base.filter(pred).select(*key_cols)
                value = unescape_kql_value(val_tok.text)
                for c in matched_clp:
                    keys = keys.unionByName(
                        search_clpstring_column(
                            base, c, dicts, value, key_cols,
                            ignore_case=ignore_case,
                        ).select(*key_cols)
                    )
                return base.join(
                    keys.dropDuplicates(key_cols), key_cols, "leftsemi"
                )
        return base.filter(
            KqlCompiler(
                _plain_view(base, dicts), array_json_cols=array_cols
            ).compile(clause)
        )

    if not ops or ops[0] == "and":
        out = encoded
        for clause in clauses:
            out = apply_clause(out, clause)
        return out
    results = [apply_clause(encoded, c) for c in clauses]
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.dropDuplicates(key_cols)
