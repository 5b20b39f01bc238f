"""Pure-Python MHTML/MIME kernel — no Spark imports allowed here.

The same code runs inside Arrow-batched Spark UDFs (frontier.spark.parse)
and under plain pytest (tests/test_mhtml_parity.py).
"""
