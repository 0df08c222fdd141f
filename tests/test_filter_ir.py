"""Unit tests for the Filter/Logic IR (no Spark needed beyond compile)."""

import pytest

from feature_store_api_spark.constructor.filter import Filter, Logic
from feature_store_api_spark.feature import Feature, autofix_feature_name, ddl_to_spark_type


def test_comparison_operators_build_filters():
    f = Feature("x", "bigint")
    for expr, cond in [
        (f > 1, Filter.GT), (f >= 1, Filter.GE), (f < 1, Filter.LT),
        (f <= 1, Filter.LE), (f == 1, Filter.EQ), (f != 1, Filter.NE),
    ]:
        assert isinstance(expr, Filter)
        assert expr.condition == cond
        assert expr.value == 1
    assert (f.isin([1, 2])).condition == Filter.IN
    assert (f.like("a%")).condition == Filter.LK


def test_logic_composition():
    f = Feature("x", "int")
    g = Feature("y", "int")
    logic = (f > 1) & ((g < 5) | (g == 9))
    assert isinstance(logic, Logic)
    feats = logic.referenced_features()
    assert {x.name for x in feats} == {"x", "y"}


def test_autofix_feature_name():
    assert autofix_feature_name("Primary Key") == "primary_key"
    assert autofix_feature_name("staTe 1") == "state_1"
    assert autofix_feature_name("a-b.c") == "a_b_c"


def test_ddl_type_roundtrip():
    from pyspark.sql import types as T

    assert ddl_to_spark_type("bigint") == T.LongType()
    assert ddl_to_spark_type("array<float>") == T.ArrayType(T.FloatType())
    f = Feature("x", "tinyint")
    assert f.ddl_type == "int"  # tinyint promotion (engine/spark.py:1400-1409)


def test_unknown_condition_rejected():
    f = Feature("x", "int")
    with pytest.raises(ValueError):
        Filter(f, "BETWEEN", 1)
