"""Scalar kernels: native Spark SQL expression builders and the small
sanctioned pandas-UDF surface (HTML extraction, urljoin resolution,
robots matching)."""
