"""Scalar function families and the Python UDF/UDAF/UDTF surface."""
