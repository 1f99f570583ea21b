"""cosql parser round-trips (reference test inputs, cosql/*/tests)."""

import pytest

from cosdata_tpu.cosql import ParseError, parse_statement, parse_statements


class TestDefinitions:
    def test_entity_definition(self):
        stmt = parse_statement(
            """define entity person as
                name: string,
                age: int,
                date_of_birth: date;"""
        )
        assert stmt["kind"] == "entity_definition"
        assert stmt["name"] == "person"
        assert [a["name"] for a in stmt["attributes"]] == [
            "name", "age", "date_of_birth",
        ]
        assert [a["data_type"] for a in stmt["attributes"]] == [
            "string", "int", "date",
        ]

    def test_relationship_definition(self):
        stmt = parse_statement(
            "define relationship assigned_to as (project: project, assignee: person);"
        )
        assert stmt["kind"] == "relationship_definition"
        assert stmt["roles"] == [
            {"name": "project", "entity_type": "project"},
            {"name": "assignee", "entity_type": "person"},
        ]

    def test_relationship_definition_with_attributes(self):
        stmt = parse_statement(
            "define relationship employment as (employer: company, employee: person)"
            " as start_date: date, salary: double;"
        )
        assert [a["name"] for a in stmt["attributes"]] == ["start_date", "salary"]

    def test_rule(self):
        stmt = parse_statement(
            """define rule reachable_direct as
                match
                    (from: $city1, to: $city2) forms direct_flight
                infer
                    materialize (from: $city1, to: $city2) forms reachable;"""
        )
        assert stmt["kind"] == "rule"
        assert stmt["inference_type"] == "materialize"
        assert stmt["patterns"][0]["relationship_type"] == "direct_flight"
        assert stmt["inference"]["relationship_type"] == "reachable"


class TestInsertions:
    def test_entity_insertion(self):
        stmt = parse_statement(
            """insert $rust_dev isa person (
                name: "The Rust Dev",
                age: 54,
                date_of_birth: 01-01-1970
            );"""
        )
        assert stmt["kind"] == "entity_insertion"
        assert stmt["variable"] == "rust_dev"
        vals = {a["name"]: a["value"] for a in stmt["attributes"]}
        assert vals["name"] == {"kind": "string", "value": "The Rust Dev"}
        assert vals["age"] == {"kind": "int", "value": 54}
        assert vals["date_of_birth"] == {"kind": "date", "value": [1, 1, 1970]}

    def test_relationship_insertion(self):
        stmt = parse_statement(
            """insert $relation1 (
                project: $rust_project,
                assignee: $rust_dev
            ) forms assigned_to;"""
        )
        assert stmt["kind"] == "relationship_insertion"
        assert stmt["roles"] == [
            {"role": "project", "entity": "rust_project"},
            {"role": "assignee", "entity": "rust_dev"},
        ]


class TestQueries:
    def test_full_query(self):
        stmt = parse_statement(
            """match
                $employee1 isa person ( name: $name1 ),
                $employee2 isa person ( name: $name2 ),
                $project isa project ( name: $project_name ),
                ($employee1, $project) forms assigned_to,
                ($employee2, $project) forms assigned_to,
                $employee1 != $employee2
            get $name1, $name2, $project_name;"""
        )
        assert stmt["kind"] == "query"
        kinds = [p["kind"] for p in stmt["patterns"]]
        assert kinds == [
            "entity_pattern", "entity_pattern", "entity_pattern",
            "relationship_pattern", "relationship_pattern", "condition",
        ]
        assert stmt["patterns"][3]["roles"][0] == {"role": None, "entity": "employee1"}
        assert stmt["get"] == ["name1", "name2", "project_name"]

    def test_compute_clause(self):
        stmt = parse_statement(
            """match
                $item isa product ( cost_price: $cost_price,
                                    selling_price: $selling_price )
            compute
                $profit = $selling_price - $cost_price,
                $profit_percentage = ($profit / $cost_price) * 100
            get $profit_percentage;"""
        )
        c = stmt["compute_clauses"]
        assert c[0]["variable"] == "profit"
        assert c[0]["expression"]["operator"] == "-"
        assert c[1]["expression"]["operator"] == "*"
        assert c[1]["expression"]["left"]["operator"] == "/"

    def test_expression_precedence(self):
        stmt = parse_statement(
            "match $x isa t compute $y = 1 + 2 * 3 ** 2 ** 2 get $y;"
        )
        e = stmt["compute_clauses"][0]["expression"]
        assert e["operator"] == "+"
        assert e["right"]["operator"] == "*"
        # ** right-associative: 3 ** (2 ** 2)
        assert e["right"]["right"]["operator"] == "**"
        assert e["right"]["right"]["right"]["operator"] == "**"


class TestErrorsAndMulti:
    def test_multiple_statements(self):
        stmts = parse_statements(
            """define entity city as name: string;
               insert $a isa city (name: "Paris");
               insert $b isa city (name: "Tokyo");"""
        )
        assert len(stmts) == 3

    def test_error_has_location(self):
        with pytest.raises(ParseError, match="line"):
            parse_statement("define entity as;")

    def test_trailing_garbage(self):
        with pytest.raises(ParseError):
            parse_statement("define entity c as name: string; zzz")


class TestReferenceGrammarEdges:
    """Edges from the reference grammar (value.rs) the port initially
    missed: negative literals and 1-2 digit date fields."""

    def test_negative_literals(self):
        stmt = parse_statement(
            "match $p isa person ( age: $a ), $a > -1 get $p;"
        )
        cond = [p for p in stmt["patterns"] if p["kind"] == "condition"][0]
        assert cond["right"] == {"kind": "int", "value": -1}
        stmt = parse_statement(
            "match $p isa person ( score: $s ), $s < -2.5 get $p;"
        )
        cond = [p for p in stmt["patterns"] if p["kind"] == "condition"][0]
        assert cond["right"] == {"kind": "double", "value": -2.5}

    def test_short_date_fields(self):
        stmt = parse_statement("insert $e isa person ( dob: 1-1-2024 );")
        attr = stmt["attributes"][0]
        assert attr["value"] == {"kind": "date", "value": [1, 1, 2024]}
