"""True Structured Streaming implementations of the §2.9 operators.

The oracle-checked batch twins live in ``operators/streaming_twins.py``;
these run the same logic as real streams (file source + memory sink)
and are asserted equal to the twins in tests/test_streaming.py.
"""
