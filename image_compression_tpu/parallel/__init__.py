"""Device mesh, shardings, and data-parallel training (absent in the
reference, which is single-GPU only — SURVEY.md section 2 parallelism
inventory)."""
