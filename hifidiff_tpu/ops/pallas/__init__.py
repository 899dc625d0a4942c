from hifidiff_tpu.ops.pallas.ln_film import ln_film_pallas

__all__ = ["ln_film_pallas"]
