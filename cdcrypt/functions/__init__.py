"""Column-level building blocks: vectorized crypto UDFs, field-path compiler,
condition gate, and text-analysis expression builders."""
