# Convenience targets (the package itself is pure-Python + an optional
# build-on-demand native importer lib; see madrona_renderer_tpu/native/).

PY ?= python

.PHONY: test native bench ladder goldens fuzz clean

test:
	$(PY) -m pytest tests/ -q

native:
	$(PY) -c "from madrona_renderer_tpu import native; assert native.load() is not None, 'native build failed'; print('native importer built')"

bench:
	$(PY) bench.py

ladder:
	$(PY) tools/tpu_ladder.py

goldens:
	$(PY) tools/gen_goldens.py

fuzz:
	$(PY) -m pytest tests/test_native_fuzz.py -q

clean:
	rm -f madrona_renderer_tpu/native/*.so
	find . -name __pycache__ -type d | xargs rm -rf
