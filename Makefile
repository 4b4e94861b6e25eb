# Developer targets. The TCK full-corpus run is too slow for pytest
# (~15 min over 4 parallel shards); `make tck` runs it and refreshes
# TCK_TALLY.md so regressions in unfloored areas are caught per round.

SHARDS := 0 1 2 3

.PHONY: test tck bench oracle

test:
	python3 -m pytest tests/ -x -q

bench:
	python3 bench.py

oracle:
	python3 tools/compare_oracle.py /root/testdata/sf0.01

tck:
	@for i in $(SHARDS); do \
	  SPARK_GRAFT_CPUS=8 python3 tools/run_tck.py --shard $$i/4 \
	    --out /tmp/tck_shard_$$i.txt > /tmp/tck_shard_$$i.log 2>&1 & \
	done; wait
	python3 tools/tally_tck.py /tmp/tck_shard_0.txt /tmp/tck_shard_1.txt \
	  /tmp/tck_shard_2.txt /tmp/tck_shard_3.txt > TCK_TALLY.md
	@tail -n 5 TCK_TALLY.md
