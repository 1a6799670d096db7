# Developer entry points.

.PHONY: test native bench demo clean

test:
	python -m pytest tests/ -q

native:
	$(MAKE) -C native

bench:
	python bench.py

demo:
	python examples/groovebox_demo.py /tmp/groovebox_demo.wav

clean:
	$(MAKE) -C native clean
	rm -f native/zl_hostcore.so
