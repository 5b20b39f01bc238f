"""Spark-side operators of the frontier engine.

Everything here is DataFrame-first: Catalyst owns planning; Python
appears only inside Arrow-batched kernels (mapInArrow / applyInPandas /
pandas_udf). No per-row Python UDFs anywhere.
"""
