"""Operator compilers: spec nodes -> Column expressions / pandas UDF stages."""
