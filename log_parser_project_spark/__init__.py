"""PySpark-native transcript analytics engine.

A from-scratch re-imagining of the capabilities of
``tmultani945/log_parser_project`` (an NR5G ICD hex-packet decoder — see
``SURVEY.md``) as a grok/regex **parse → enrich → route → aggregate**
pipeline over tables of multi-turn agent transcripts
``(conv_id, turn_idx, role, text, tool, ts)``.

Design: everything is expressed with the DataFrame API so Catalyst can
optimize (predicate pushdown, column pruning, broadcast joins, AQE);
the only Python on the hot path is a single vectorized Arrow-batched
regex-extraction stage (``operators/parse.py``), the analog of the
reference's schema-table-driven field decoder
(``hex_decoder_module/decoder/payload_decoder.py``).
"""

__version__ = "0.1.0"
