from .datagen import generate_redundant, generate_binomial, generate_single_symbol

__all__ = ["generate_redundant", "generate_binomial", "generate_single_symbol"]
