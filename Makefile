# Convenience targets. The driver uses bench.py / __graft_entry__.py directly.
.PHONY: test bench native clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

native:
	$(MAKE) -C restrictive_hierarchical_semantic_segmentation_tpu/runtime

clean:
	$(MAKE) -C restrictive_hierarchical_semantic_segmentation_tpu/runtime clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
