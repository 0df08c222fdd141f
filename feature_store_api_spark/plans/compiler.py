"""Query → DataFrame compiler.

This replaces the reference's remote SQL generation boundary
(``/root/reference/python/hsfs/core/query_constructor_api.py:23-31`` →
server-built SQL strings in ``constructor/fs_query.py:26-62``) with a
local, declarative compile to DataFrame operations. Catalyst then does
predicate pushdown, column pruning, join strategy selection and AQE —
nothing here hand-schedules physical execution.

Semantics compiled (parity ``constructor/query.py``):
  * per-feature-group source binding, with time-travel bounds
  * join chain with explicit / inferred (pk-intersection) keys,
    USING-style key merge when the key names match on both sides
  * right-side ``prefix`` renaming (``constructor/join.py:43,51``)
  * ambiguity detection (``constructor/query.py:661-752``)
  * filters applied as one conjunction over the joined result (WHERE
    semantics — ``constructor/query.py:775-785``)
  * final projection in declaration order
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..constructor.join import JoinType
from ..feature import autofix_feature_name


def _normalize_columns(df: DataFrame) -> DataFrame:
    """Sanitize incoming column names (parity ``engine/spark.py:302-338``)."""
    renames = {c: autofix_feature_name(c) for c in df.columns}
    if all(k == v for k, v in renames.items()):
        return df
    return df.select([F.col(c).alias(n) for c, n in renames.items()])


def _compile_node(
    q, spark: SparkSession, online: bool
) -> Tuple[DataFrame, List[str], Dict[Tuple[int, str], str]]:
    """Compile one Query node.

    Returns ``(df, selected_outnames, colmap)`` where ``colmap`` maps
    ``(id(feature_group), feature_name) -> column name in df`` so the
    top-level filter tree can resolve features through prefix renames.
    """
    fg = q.left_feature_group
    df = _normalize_columns(fg.read_source(spark, q.start_time, q.end_time))
    if online:
        df = _latest_per_key(df, fg)

    colmap = {(id(fg), f.name): f.name for f in fg.features if f.name in df.columns}
    sel = [f.name for f in q.left_features]

    for join in q.joins:
        rdf, rsel, rcolmap = _compile_node(join.query, spark, online)
        how = join.join_type

        # -- join keys: explicit, or maximal matching subset of the two
        #    sides' primary keys (parity constructor/query.py:246-249)
        if join.on:
            lkeys = rkeys = [autofix_feature_name(k) for k in join.on]
        elif join.left_on:
            lkeys = [autofix_feature_name(k) for k in join.left_on]
            rkeys = [autofix_feature_name(k) for k in join.right_on]
        elif how == JoinType.CROSS:
            lkeys, rkeys = [], []
        else:
            rpk = set(join.query.left_feature_group.primary_key)
            keys = [k for k in fg.primary_key if k in rpk]
            if not keys:
                raise ValueError(
                    f"No join keys: primary keys of {fg.name!r} and "
                    f"{join.query.left_feature_group.name!r} share no names; "
                    "pass on= or left_on=/right_on="
                )
            lkeys = rkeys = keys

        using = bool(lkeys) and lkeys == rkeys

        # -- prefix rename on the right side (parity join.py:43,51);
        #    USING keys keep their name so Spark merges them
        ren: Dict[str, str] = {}
        for c in rdf.columns:
            if using and c in rkeys:
                ren[c] = c
            else:
                ren[c] = (join.prefix + c) if join.prefix else c
        if any(k != v for k, v in ren.items()):
            rdf = rdf.select([F.col(c).alias(n) for c, n in ren.items()])
        rkeys = [ren[k] for k in rkeys]
        rsel = [ren[s] for s in rsel]

        # -- collision handling: drop unneeded duplicate names from the
        #    right; needed duplicates are an ambiguity error
        needed = set(rsel) | set(rkeys)
        left_cols = set(df.columns)
        merge_keys = set(rkeys) if using else set()
        for c in list(rdf.columns):
            if c in left_cols and c not in merge_keys:
                if c in needed:
                    raise ValueError(
                        f"Ambiguous column {c!r} on both sides of join with "
                        f"{join.query.left_feature_group.name!r}; use prefix="
                    )
                rdf = rdf.drop(c)

        # -- the join itself
        if how == JoinType.CROSS:
            df = df.crossJoin(rdf)
        elif using:
            df = df.join(rdf, on=list(rkeys), how=how)
        else:
            cond = None
            for l, r in zip(lkeys, rkeys):
                c = F.col(l) == F.col(r)
                cond = c if cond is None else (cond & c)
            df = df.join(rdf, on=cond, how=how)

        if how in (JoinType.LEFT_SEMI, JoinType.LEFT_ANTI):
            continue  # right columns do not survive semi/anti joins

        sel.extend(rsel)
        for key, v in rcolmap.items():
            out = ren.get(v, v)
            if out in df.columns:
                colmap[key] = out

    return df, sel, colmap


def _latest_per_key(df: DataFrame, fg) -> DataFrame:
    """Online view: newest row per primary key (parity of the online
    store's upsert semantics, SURVEY §2.5 / ``core/hudi_engine.py:141-149``)."""
    from ..operators.dedup import latest_per_key

    if not fg.primary_key or not fg.event_time:
        return df
    return latest_per_key(df, fg.primary_key, order_by=[fg.event_time])


def _make_resolver(colmap):
    def resolve(feature) -> Column:
        fg = feature.feature_group
        if fg is not None:
            name = colmap.get((id(fg), feature.name))
            if name is not None:
                return F.col(name)
        # fall back to bare-name resolution
        hits = {v for (fgid, fname), v in colmap.items() if fname == feature.name}
        if len(hits) == 1:
            return F.col(next(iter(hits)))
        if len(hits) > 1:
            raise ValueError(f"Ambiguous filter feature {feature.name!r}")
        raise KeyError(f"Filter feature {feature.name!r} not found in plan")

    return resolve


def compile_query(q, spark: SparkSession, online: bool = False) -> DataFrame:
    df, sel, colmap = _compile_node(q, spark, online)

    logic = q.filters
    if logic is not None:
        df = df.where(logic.to_column(_make_resolver(colmap)))

    # final projection, declaration order, first occurrence wins
    out, seen = [], set()
    for name in sel:
        if name not in seen:
            seen.add(name)
            out.append(name)
    return df.select(*out)


def compile_query_online(q, spark: SparkSession) -> DataFrame:
    """Online read: every feature group collapsed to latest-per-key
    before the join/filter plan (parity ``constructor/query.py:135-207``
    ``online=True`` path)."""
    return compile_query(q, spark, online=True)
