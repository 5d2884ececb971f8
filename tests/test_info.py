"""Info table + multigen parser tests (layer L3)."""

from doomtpu.info.multigen import parse_multigen
from doomtpu.info.gen_tables import generate


SAMPLE = """
; comment
$ DEFAULT
doomednum -1
spawnstate S_NULL
deathstate S_NULL
xdeathstate S_NULL
radius 20*FRACUNIT
height 16*FRACUNIT

S_NULL   TROO A -1 NULL S_NULL
S_SPIN1  THNG A* 4 NULL S_SPIN2
S_SPIN2  THNG B 4* NULL S_SPIN1

$ MT_THING
doomednum 1234
spawnstate S_SPIN1
height 68*FRACUNIT radius 16*FRACUNIT
"""


def test_parse_sample():
    d = parse_multigen(SAMPLE)
    assert [s.name for s in d.states] == ["S_NULL", "S_SPIN1", "S_SPIN2"]
    assert d.sprite_names == ["TROO", "THNG"]
    s1 = d.states[1]
    assert s1.frame == 0 and s1.full_bright and s1.tics == 4
    # stray '*' on tics doesn't imply full bright (matches reference output)
    s2 = d.states[2]
    assert s2.frame == 1 and not s2.full_bright and s2.tics == 4
    # DEFAULT emitted as entry 0 + inheritance; pairs-on-one-line
    assert [m.name for m in d.mobjs] == ["DEFAULT", "MT_THING"]
    mt = d.mobjs[1]
    assert mt.fields["doomednum"] == 1234
    assert mt.fields["height"] == 68 and mt.fields["radius"] == 16
    assert mt.fields["deathstate"] == "S_NULL"  # inherited


def test_generated_counts(info):
    # the reference's generated tables are 138/967/138
    # (info.rs:8-147, 293-1261, 2258)
    assert len(info.sprite_names) == 138
    assert len(info.state_names) == 967
    assert len(info.mobj_names) == 138


def test_known_entries(info):
    barrel = info.mobj_index_by_doomednum()[2035]
    assert info.mobj_names[barrel] == "MT_BARREL"
    assert info.state_names[info.mobj_spawn[barrel]] == "S_BAR1"
    assert info.state_names[info.mobj_death[barrel]] == "S_BEXP"
    # barrel animation: S_BAR1 <-> S_BAR2, 6 tics each
    s = info.state_id("S_BAR1")
    assert info.state_tics[s] == 6
    nxt = int(info.state_next[s])
    assert info.state_names[nxt] == "S_BAR2"
    assert info.state_names[int(info.state_next[nxt])] == "S_BAR1"
    # S_NULL freezes (tics -1)
    assert info.state_tics[0] == -1


def test_codegen_emits_importable_module(tmp_path):
    code = generate(SAMPLE)
    mod_path = tmp_path / "gen.py"
    mod_path.write_text(code)
    ns = {}
    exec(compile(code, "gen.py", "exec"), ns)
    assert ns["STATE_TICS"] == [-1, 4, 4]
    assert ns["MOBJ_DOOMEDNUM"] == [-1, 1234]
