"""cosql — declarative graph query language parser.

Parity with /root/reference/src/cosql/ (≈3.7k LoC of nom combinators):
`define entity/relationship/rule`, `insert`, `match ... get/compute/infer`.
Like the reference, only the parser ships — no evaluation engine is wired to
the server (reference: exported from lib.rs:7 but never called, SURVEY.md §2.7).
"""

from cosdata_tpu.cosql.parser import parse_statement, parse_statements  # noqa: F401
from cosdata_tpu.cosql.parser import ParseError  # noqa: F401
