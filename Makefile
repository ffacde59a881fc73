.PHONY: native test bench clean

native:
	python csrc/setup.py build_ext --build-lib .

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	rm -rf build mvc_tpu/_native*.so mvc_tpu/__pycache__
