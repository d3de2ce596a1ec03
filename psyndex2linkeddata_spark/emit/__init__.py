"""Triple emitters (SURVEY.md §2.6 N1-N20): record → array<triple> columns.

Every emitter is a pure column expression factory: given the records
DataFrame's columns it returns one `array<struct<subj,pred,obj,obj_is_iri,
lang,dtype>>` column. The pipeline concatenates all emitter arrays and
explodes ONCE — a single scan, a single projection, fully inside
whole-stage codegen, no Python in the hot path. This is the Spark-first
replacement for the reference's per-record `graph.add` calls
(/root/reference/convert_starxml_to_bf.py:1176-1503).
"""
