"""Map model: the GaussianMap pytree and its optimizer."""
