"""Scale-oriented plan rewrites (band-join bucketing, salting) and
plan-inspection helpers used by tests to assert physical strategies."""
