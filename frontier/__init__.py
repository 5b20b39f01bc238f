"""frontier — a PySpark-native crawl-frontier + MHTML-extraction engine.

From-scratch reimplementation of the capabilities of Querela/MHTML
(reference at /root/reference, MIT) re-expressed Spark-first:

- ``frontier.kernel``   pure-Python MIME/MHTML parse + decode kernel
                        (no Spark imports; shared by the pytest parity
                        suite and the Arrow-vectorized Spark UDFs)
- ``frontier.spark``    DataFrame operators: parse/extract, URL-seen
                        Bloom set, politeness scheduler, robots gating,
                        snapshots, crawl loop, text/dedup/ANN ops
- ``frontier.synth``    deterministic Common-Crawl-style page generator
"""

__version__ = "0.1.0"
