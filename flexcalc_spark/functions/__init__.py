"""Scalar-function modules — populated in the scalar-functions phase."""
