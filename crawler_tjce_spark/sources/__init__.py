"""Sources & sinks: Iceberg-style snapshot tables, the DSR wire-format
decoder, and the pt-BR formatted CSV sink."""
