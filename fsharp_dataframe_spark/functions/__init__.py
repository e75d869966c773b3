"""Parity-plus functions: text analysis, dedup, similarity, multimodal.

These are the LLM-data-pipeline operators (BASELINE.json north star)
built as first-class engine components: pure Column expressions where
possible (codegen), Arrow-batched Pandas UDFs where not, with scale
notes per operator.
"""
