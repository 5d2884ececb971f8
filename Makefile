# Repo-level convenience targets.

# Regenerate doomtpu/info/_tables.py from the committed multigen data
# file (original id Software game data; the reference commits the same
# file as multigen/multigen.txt and reads it in multigen/src/main.rs:228).
regen-tables:
	python -m doomtpu.info.gen_tables doomtpu/info/multigen.txt \
	    -o doomtpu/info/_tables.py

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -x -q

.PHONY: regen-tables native test
