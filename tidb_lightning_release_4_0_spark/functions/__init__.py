"""Scalar / aggregate function library (checksum, hashing, MySQL literals)."""
