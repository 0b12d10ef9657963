"""Full document assembly for the reference's demo schema — the exact
semantics its consistency test checks (reference: demo/schema.sql:62-84
config comments; demo/consistency_test.go:84-103 assertions).

Config translated from the SQL-comment struct tags:

  main_doc   COMMENT 'index:"main,all" join:"join,immaparent"
                      inline:"inline_name,inlined_field"'
             id:       'index:",routing,id"'  → _id = raw id, routing = id
             ignore_me:'index:"-"'            → dropped
             → doc: all remaining columns + docType="main_doc"
               + join={name:"immaparent"} + inlined_field=[{id,value}…]

  inline_doc COMMENT 'index:"-"' (never a standalone doc)
             parent_id:'inline:"inline_name,_pk,parent,routing"'
             id:       'inline:"inline_name,pk"'
             value:    'inline:"inline_name"'
             → embedded objects {id, value} on the parent, keyed by id
               (ignore_me has no inline tag → excluded)

  child_doc  COMMENT 'index:"child,all" join:"join,immachild"'
             id:       'index:",id"'          → _id = raw id
             parent_id:'index:",routing" join:"parent"'
             ignore_me:'index:"-"'
             → doc: id, parent_id, value + docType="child_doc"
               + join={name:"immachild", parent: parent_id}, routed by parent

The reference maintains the inline arrays incrementally with painless
scripts inside ES (search/scripts/inline_add.painless:1-17); batch-building
an immutable snapshot collapses that to FK join + collect_list (SURVEY §1.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_main_docs(main_df: DataFrame, inline_df: DataFrame) -> DataFrame:
    inl = (
        inline_df.groupBy("parent_id")
        .agg(
            F.sort_array(F.collect_list(F.struct(F.col("id"), F.col("value")))).alias(
                "inlined_field"
            )
        )
    )
    out = (
        main_df.drop("ignore_me")  # index:"-"
        .join(inl, main_df.id == inl.parent_id, "left")
        .drop("parent_id")
    )
    return out.select(
        F.col("id").alias("_id"),  # index:",id" → raw id, no table prefix
        F.col("id").alias("routing"),  # index:",routing"
        F.lit("main_doc").alias("doc_type"),  # injected constant (table.go:163)
        F.struct(
            "id",
            "date",
            "deleted",
            "nested",
            "non_searchable_field",
            "text",
            "text_array",
            F.struct(F.lit("immaparent").alias("name")).alias("join"),
            F.coalesce("inlined_field", F.array()).alias("inlined_field"),
        ).alias("doc"),
    )


def assemble_child_docs(
    child_df: DataFrame, join_name: str = "immachild", join_name_col: str | None = None
) -> DataFrame:
    """``join_name_col``: take the ES join-field NAME from a column instead
    of the config literal — the reference's polymorphic form where
    ``join:"join"`` has no name and the value column supplies it per row
    (reference: postgres/table_join.go:19-33)."""
    name_expr = F.col(join_name_col) if join_name_col else F.lit(join_name)
    doc_cols = ["id", "parent_id", "value"]
    return child_df.drop("ignore_me").select(
        F.col("id").alias("_id"),
        F.col("parent_id").alias("routing"),  # routed to the parent's shard
        F.lit("child_doc").alias("doc_type"),
        F.struct(
            *doc_cols,
            F.struct(
                name_expr.alias("name"), F.col("parent_id").alias("parent")
            ).alias("join"),
        ).alias("doc"),
    )


def assemble_reference_docs(main_df, inline_df, child_df) -> dict[str, DataFrame]:
    """Both doc streams, parent-first (P15 ordering, config.go:56-87)."""
    return {
        "main_doc": assemble_main_docs(main_df, inline_df),
        "child_doc": assemble_child_docs(child_df),
    }
