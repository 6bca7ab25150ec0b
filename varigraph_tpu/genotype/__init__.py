from .pipeline import run_genotype
