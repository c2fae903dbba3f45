"""Host-side utilities: data generation, measurement, CSV output."""

from .gen import exp1_data, exp4_data, gen_rand_int_vec, mt19937_stream

__all__ = ["exp1_data", "exp4_data", "gen_rand_int_vec", "mt19937_stream"]
