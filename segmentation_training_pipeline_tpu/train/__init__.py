from .stage import fit_pipeline
