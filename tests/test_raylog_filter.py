"""The empty-bundle schema-warning filter drops ONLY the benign
zero-yield-task variant (state/raylog.py) — real divergences pass."""

import logging

from jschon_ray.state.raylog import (_EmptyBundleSchemaFilter,
                                     quiet_empty_schema_warnings)


def _rec(msg: str, level=logging.WARNING) -> logging.LogRecord:
    return logging.LogRecord("ray.data", level, __file__, 1, msg, (), None)


def test_drops_schema_none_bundle():
    f = _EmptyBundleSchemaFilter()
    msg = ("Operator produced a RefBundle with a different schema than "
           "the previous one. Previous schema: doc_id: int64\npos: int64, "
           "new schema: . This may lead to unexpected behavior.")
    assert not f.filter(_rec(msg))


def test_drops_nameless_pandas_bundle():
    f = _EmptyBundleSchemaFilter()
    msg = ("Operator produced a RefBundle with a different schema than "
           "the previous one. Previous schema: PandasBlockSchema("
           "names=['a'], types=[dtype('int64')]), new schema: "
           "PandasBlockSchema(names=[], types=[]). This may lead to "
           "unexpected behavior.")
    assert not f.filter(_rec(msg))


def test_keeps_genuine_divergence():
    f = _EmptyBundleSchemaFilter()
    msg = ("Operator produced a RefBundle with a different schema than "
           "the previous one. Previous schema: a: int64, new schema: "
           "a: string. This may lead to unexpected behavior.")
    assert f.filter(_rec(msg))


def test_keeps_unrelated_warnings_and_other_levels():
    f = _EmptyBundleSchemaFilter()
    assert f.filter(_rec("something else entirely"))
    assert f.filter(_rec("new schema: . ", level=logging.INFO))


def test_install_idempotent():
    quiet_empty_schema_warnings()
    quiet_empty_schema_warnings()
    logger = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state")
    n = sum(isinstance(x, _EmptyBundleSchemaFilter)
            for x in logger.filters)
    assert n == 1
