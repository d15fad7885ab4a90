"""Scalar expression library — every function here is a pure Spark Column
expression (whole-stage-codegen eligible) unless its docstring says otherwise.
"""
