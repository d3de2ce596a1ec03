"""Structured Streaming surface (SURVEY §2.8): batch-incremental triple
construction over an append-only pages directory, plus windowed/stateful
event operators. The reference is a bounded batch job; streaming here
delivers the north_rule's resumability through the file-source checkpoint
(exactly-once per input file) on top of sources/checkpoint.py's
bucket-level lineage."""
