"""grobid_medical_report_spark — a brand-new PySpark-native extraction engine.

Re-expresses the capabilities of the reference
`tantikristanti/grobid-medical-report` (a Java/Wapiti GROBID module that turns
French medical reports into structured TEI) as an idiomatic Spark pipeline:

* input: a table of interleaved text + media spans
  ``(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``
* stages: layout tokenization -> zone segmentation -> header / left-note /
  body / NER parsing -> ordered span-sequence assembly, all as vectorized
  pandas/Arrow UDF stages (``mapInPandas``), no per-row Python UDFs
* output: per-doc ``spans array<struct<kind,text,media_ref,order>>`` plus
  typed header/left-note structs and NER entity arrays

See SURVEY.md for the operator-by-operator mapping to the reference.
"""

__version__ = "0.1.0"
