"""Query-plan-level layers: Vector SQL dialect pre-pass, self-query filter
compiler. These are the reference's two NL→query IR paths (SURVEY §3.1/§3.2)
with the LLM stripped off — we start at the SQL-string / filter-AST seam."""
