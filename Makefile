# Repo-level convenience targets.

.PHONY: results results-check sim test

# Regenerate every published RESULTS.md table from the results/*.json
# artifacts (produced by scripts/full_run.py / scripts/ref_sweep.py).
results:
	python scripts/render_results.py

# CI guard: fail if a published table drifted from its artifact.
results-check:
	python scripts/render_results.py --check

sim:
	$(MAKE) -C diral_tpu/interop/cpp

test:
	python -m pytest tests/ -q
