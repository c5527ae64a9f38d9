"""Tables DataFrame-cache behavior: per-session keying.

The hazard being regression-tested: a cache keyed by ``id(session)``
in a process-global dict can serve DataFrames bound to a stopped
session when CPython recycles the id for a new session object. The
cache now lives as an attribute on the session object itself, so (a)
sessions never share entries, (b) each session is served DataFrames
bound to it, and (c) the cache is collected with the session.
"""

from __future__ import annotations


from thrive_spark.tables import _CACHE_ATTR, Tables


def test_cache_is_per_session(spark, sf_dir):
    t1 = Tables(spark, sf_dir)
    df1 = t1.lineitem
    assert t1.lineitem is df1  # cached within a session

    s2 = spark.newSession()
    t2 = Tables(s2, sf_dir)
    df2 = t2.lineitem
    assert df2 is not df1  # a different session never shares plans
    assert df2.sparkSession is s2
    assert t2.lineitem is df2
    # and the second session's cache never leaked into the first
    assert getattr(spark, _CACHE_ATTR) is not getattr(s2, _CACHE_ATTR)


def test_no_process_global_cache(spark, sf_dir):
    """The module must hold no global DataFrame cache: the cache hangs
    off the session object, so nothing in thrive_spark pins a stopped
    session or can serve its plans to a successor (PySpark internals
    may still reference sessions; that's outside our control)."""
    from thrive_spark import tables as tables_mod

    Tables(spark, sf_dir).lineitem
    globals_with_df = [
        n
        for n, v in vars(tables_mod).items()
        if isinstance(v, dict) and v and not n.startswith("__")
    ]
    assert globals_with_df == [], globals_with_df


def test_fresh_session_object_gets_fresh_dataframes(spark, sf_dir):
    """Churn sessions: even if a new session object lands on a recycled
    ``id()``, it must get DataFrames bound to itself."""
    for _ in range(3):
        s = spark.newSession()
        df = Tables(s, sf_dir).lineitem
        assert df.sparkSession is s
