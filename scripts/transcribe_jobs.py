#!/usr/bin/env python3
"""Transcribe the reference's 52 Glue job scripts into declarative
conformance metadata (dev-side codegen tool; the shipped artifact is the
committed JSON read by graft.sources.ConformanceJobs).

Parses each job with Python's `ast`, walks the PySpark DataFrame chains,
and emits per-job JSON:
  {name, layer, sources: [{name, layer, principal}],
   steps: [{name, ops: [...]}], result, idColumns, partitionColumns,
   writeMode}
where ops are the linear encoding of the chain:
  {"op":"from","ref":..,"alias":..}
  {"op":"join","ref":..,"alias":..,"type":..,"on":<sql>}
  {"op":"filter","expr":<sql>}
  {"op":"select","cols":[{target,source,targetType,literal,function}]}
  {"op":"groupBy","keys":[<sql>...],"aggs":[cols]}
  {"op":"withColumn","name":..,"expr":<sql>}
  {"op":"union","ref":..} / {"op":"unionByName","ref":..}
  {"op":"distinct"} / {"op":"dropDuplicates","cols":[...]}
  {"op":"orderBy","keys":[<sql>...]}
Select columns reuse the Conformance.Col vocabulary where the shape
matches (default / literal), falling back to function="expr" with a
Spark-SQL expression string (also valid DuckDB SQL for the oracle
replay). Runtime placeholders: __PERIODS__ (the get_periods() list) and
__TODAY__ (the injected clock for current_date()).

Reference anchors: artifacts/aws-glue/code/{domain,analytics}/*.py,
layer read/upsert semantics in common_jobs_functions.py:222-356.
"""
import ast
import json
import os
import re
import sys

REF = "/root/reference/artifacts/aws-glue/code"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/main/resources/graft/conformance")

TYPE_NAMES = {
    "StringType": "string", "DateType": "date", "TimestampType": "timestamp",
    "IntegerType": "int", "LongType": "bigint", "DoubleType": "double",
    "BooleanType": "boolean", "ShortType": "int", "FloatType": "double",
}

SQL_FUNCS = {
    # pyspark function -> sql name (None = same)
    "concat": None, "concat_ws": None, "coalesce": None, "trim": None,
    "upper": None, "lower": None, "split": None, "substring": None,
    "round": None, "date_format": None, "regexp_replace": None,
    "add_months": None, "datediff": None, "to_date": None,
    "to_timestamp": None, "sum": None, "max": None, "min": None,
    "first": "first", "avg": None, "count": None, "abs": None,
    "length": None, "row_number": None,
}


def q(s):
    # Spark's SQL parser processes backslash escapes inside string
    # literals (escapedStringLiterals=false), so a python pattern like
    # \| must be emitted as '\\|' to survive as regex \|
    return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"


class Unparser:
    """pyspark expression AST -> Spark/DuckDB-portable SQL string."""

    def __init__(self, windows=None, refs=None):
        self.windows = windows if windows is not None else {}
        self.refs = refs

    def sql(self, n):
        m = getattr(self, "u_" + type(n).__name__, None)
        if m is None:
            raise ValueError(f"no unparser for {ast.dump(n)[:200]}")
        return m(n)

    # ---- leaves
    def u_Constant(self, n):
        v = n.value
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, str):
            return q(v)
        return repr(v)

    def u_Name(self, n):
        if n.id == "PERIODOS":
            return "__PERIODS__"
        raise ValueError(f"unknown name {n.id}")

    def u_List(self, n):
        return ", ".join(self.sql(e) for e in n.elts)

    def u_Tuple(self, n):
        return ", ".join(self.sql(e) for e in n.elts)

    # ---- operators
    def u_BinOp(self, n):
        if isinstance(n.op, ast.BitAnd):
            return f"({self.sql(n.left)} AND {self.sql(n.right)})"
        if isinstance(n.op, ast.BitOr):
            return f"({self.sql(n.left)} OR {self.sql(n.right)})"
        ops = {ast.Add: "+", ast.Sub: "-", ast.Mult: "*", ast.Div: "/",
               ast.Mod: "%"}
        return f"({self.sql(n.left)} {ops[type(n.op)]} {self.sql(n.right)})"

    def u_BoolOp(self, n):
        op = " AND " if isinstance(n.op, ast.And) else " OR "
        return "(" + op.join(self.sql(v) for v in n.values) + ")"

    def u_UnaryOp(self, n):
        if isinstance(n.op, ast.Not) or isinstance(n.op, ast.Invert):
            return f"(NOT {self.sql(n.operand)})"
        if isinstance(n.op, ast.USub):
            return f"(- {self.sql(n.operand)})"
        raise ValueError("unary")

    def u_Compare(self, n):
        ops = {ast.Eq: "=", ast.NotEq: "<>", ast.Lt: "<", ast.LtE: "<=",
               ast.Gt: ">", ast.GtE: ">="}
        return (f"({self.sql(n.left)} {ops[type(n.ops[0])]} "
                f"{self.sql(n.comparators[0])})")

    # ---- calls: col/lit/when/functions/method chains
    def u_Call(self, n):
        f = n.func
        if isinstance(f, ast.Name):
            name = f.id
            if name == "col":
                if self.refs is not None:
                    self.refs.append(n.args[0].value)
                return n.args[0].value
            if name == "lit":
                return self.u_Constant(n.args[0]) if isinstance(
                    n.args[0], ast.Constant) else self.sql(n.args[0])
            if name == "when":
                return self.when_chain(n)
            if name == "current_date":
                return "DATE '__TODAY__'"
            if name == "countDistinct":
                args = ", ".join(self.sql(a) for a in n.args)
                return f"count(DISTINCT {args})"
            if name == "desc":
                return f"{n.args[0].value} DESC"
            if name == "cast":  # bare cast(col, T) form (rare)
                return self.sql(n.args[0])
            if name in SQL_FUNCS:
                sqlname = SQL_FUNCS[name] or name
                # pyspark functions take str-as-COLUMN except at known
                # literal positions (format/separator/pattern/length args)
                lit_pos = {"concat_ws": {0}, "date_format": {1},
                           "regexp_replace": {1, 2}, "round": {1},
                           "substring": {1, 2}, "add_months": {1},
                           "split": {1}, "to_date": {1},
                           "to_timestamp": {1}}.get(name, set())
                rendered = []
                for idx, a in enumerate(n.args):
                    if (idx not in lit_pos and isinstance(a, ast.Constant)
                            and isinstance(a.value, str)):
                        if self.refs is not None:
                            self.refs.append(a.value)
                        rendered.append(a.value)
                    else:
                        rendered.append(self.sql(a))
                return f"{sqlname}({', '.join(rendered)})"
            raise ValueError(f"unknown fn {name}")
        if isinstance(f, ast.Attribute):
            return self.method(f.value, f.attr, n)
        raise ValueError("call")

    def when_chain(self, n):
        """when(c,v)[.when(c2,v2)].otherwise(o) -> CASE WHEN ... END.
        Called with the *outermost* Call; walk inward."""
        parts = []
        other = None
        node = n
        while True:
            f = node.func
            if isinstance(f, ast.Name) and f.id == "when":
                parts.append((node.args[0], node.args[1]))
                break
            if isinstance(f, ast.Attribute) and f.attr == "otherwise":
                other = node.args[0]
                node = f.value
            elif isinstance(f, ast.Attribute) and f.attr == "when":
                parts.append((node.args[0], node.args[1]))
                node = f.value
            else:
                raise ValueError("when chain")
        parts.reverse()
        s = "CASE"
        for c, v in parts:
            s += f" WHEN {self.sql(c)} THEN {self.sql(v)}"
        if other is not None:
            s += f" ELSE {self.sql(other)}"
        return s + " END"

    def method(self, base, attr, call):
        if attr == "otherwise" or attr == "when":
            return self.when_chain(call)
        if attr == "cast":
            t = cast_type(call.args[0])
            return f"CAST({self.sql(base)} AS {sql_type(t)})"
        if attr == "alias":  # alias inside expr position: ignore name
            return self.sql(base)
        if attr == "isin":
            elems = call.args
            if len(elems) == 1 and isinstance(elems[0], (ast.List, ast.Tuple,
                                                         ast.Name)):
                inner = self.sql(elems[0])
            else:
                inner = ", ".join(self.sql(e) for e in elems)
            return f"({self.sql(base)} IN ({inner}))"
        if attr == "between":
            return (f"({self.sql(base)} BETWEEN {self.sql(call.args[0])} "
                    f"AND {self.sql(call.args[1])})")
        if attr == "isNull":
            return f"({self.sql(base)} IS NULL)"
        if attr == "isNotNull":
            return f"({self.sql(base)} IS NOT NULL)"
        if attr == "asc":
            return f"{self.sql(base)} ASC"
        if attr == "desc":
            return f"{self.sql(base)} DESC"
        if attr == "over":
            return self.window(base, call.args[0])
        if attr == "contains":
            return f"({self.sql(base)} LIKE '%' || {self.sql(call.args[0])} || '%')"
        if attr == "getItem":
            # 1-based element_at is portable (DuckDB: list_extract)
            idx = call.args[0].value
            return f"element_at({self.sql(base)}, {idx + 1})"
        if attr == "substr":
            args = ", ".join(self.sql(a) for a in call.args)
            return f"substring({self.sql(base)}, {args})"
        raise ValueError(f"method {attr}")

    def window(self, fn, w):
        fnsql = self.sql(fn)
        spec = self.window_spec(w)
        return f"{fnsql} OVER ({spec})"

    def window_spec(self, w):
        if isinstance(w, ast.Name):
            if w.id in self.windows:
                return self.windows[w.id]
            raise ValueError(f"unknown window var {w.id}")
        # Window.partitionBy(...).orderBy(...)
        parts, orders = [], []
        node = w
        while isinstance(node, ast.Call):
            f = node.func
            if not isinstance(f, ast.Attribute):
                break
            args = [self.order_arg(a) for a in node.args]
            if f.attr == "orderBy":
                orders = args
            elif f.attr == "partitionBy":
                parts = args
            node = f.value
        s = ""
        if parts:
            s += "PARTITION BY " + ", ".join(parts)
        if orders:
            s += (" " if s else "") + "ORDER BY " + ", ".join(orders)
        return s

    def order_arg(self, a):
        if isinstance(a, ast.Constant):
            return a.value
        return self.sql(a)


def cast_type(arg):
    """cast argument -> normalized type string (Conformance vocabulary)."""
    if isinstance(arg, ast.Constant):
        return arg.value
    if isinstance(arg, ast.Call) and isinstance(arg.func, ast.Name):
        nm = arg.func.id
        if nm in TYPE_NAMES:
            return TYPE_NAMES[nm]
        if nm == "DecimalType":
            p = arg.args[0].value if arg.args else 38
            s = arg.args[1].value if len(arg.args) > 1 else 12
            return f"decimal({p},{s})"
    raise ValueError(f"cast type {ast.dump(arg)[:120]}")


def sql_type(t):
    lt = t.strip().lower()
    m = {"string": "STRING", "int": "INT", "integer": "INT",
         "bigint": "BIGINT", "date": "DATE", "timestamp": "TIMESTAMP",
         "double": "DOUBLE", "boolean": "BOOLEAN", "smallint": "INT",
         "float": "DOUBLE", "long": "BIGINT"}
    if lt in m:
        return m[lt]
    if lt.startswith("decimal") or lt.startswith("numeric"):
        if "(" in lt:
            return "DECIMAL" + lt[lt.index("("):].upper()
        return "DECIMAL(38,12)"
    return t.upper()


def select_col(u, node):
    """One select-list entry -> Conformance.Col dict, preferring the
    declarative vocabulary over raw expr."""
    # strip alias/cast wrappers in any order; outermost cast wins
    target = None
    ctype = None
    core = node
    while (isinstance(core, ast.Call)
           and isinstance(core.func, ast.Attribute)
           and core.func.attr in ("alias", "cast")):
        if core.func.attr == "alias":
            if target is None:
                target = core.args[0].value
        else:
            if ctype is None:
                ctype = cast_type(core.args[0])
        core = core.func.value
    if target is None:
        target = infer_name(core)
    # plain column -> Conformance "default"
    if (isinstance(core, ast.Call) and isinstance(core.func, ast.Name)
            and core.func.id == "col"):
        return {"target": target, "source": core.args[0].value,
                "targetType": ctype or "", "literal": "",
                "function": "default"}
    # plain literal -> Conformance "default" with literal
    if (isinstance(core, ast.Call) and isinstance(core.func, ast.Name)
            and core.func.id == "lit"
            and isinstance(core.args[0], ast.Constant)
            and (ctype is not None
                 or isinstance(core.args[0].value, (str, type(None))))):
        v = core.args[0].value
        litv = "null" if v is None else str(v)
        return {"target": target, "source": "", "targetType": ctype or "",
                "literal": litv, "function": "default"}
    # anything else: expr (outer cast folded into the expression)
    sql = u.sql(core)
    if ctype is not None:
        sql = f"CAST({sql} AS {sql_type(ctype)})"
    return {"target": target, "source": sql, "targetType": "",
            "literal": "", "function": "expr"}


def infer_name(core):
    n = core
    while (isinstance(n, ast.Call) and isinstance(n.func, ast.Attribute)
           and n.func.attr in ("cast",)):
        n = n.func.value
    if (isinstance(n, ast.Call) and isinstance(n.func, ast.Name)
            and n.func.id == "col"):
        return n.args[0].value.split(".")[-1]
    if isinstance(n, ast.Constant):
        raise ValueError("bare constant in select")
    # groupBy key reference as string
    if isinstance(n, ast.Name):
        return n.id
    raise ValueError(f"cannot infer name: {ast.dump(n)[:120]}")


class JobParser:
    def __init__(self, path, layer):
        self.path = path
        self.layer = layer
        self.name = os.path.splitext(os.path.basename(path))[0]
        self.sources = {}      # var -> {name, layer, principal}
        self.steps = []        # [{name, ops}]
        self.stepnames = set()
        self.windows = {}      # var -> window spec sql
        self.refs = []         # col() names seen during unparse
        self.u = Unparser(self.windows, self.refs)
        self.stage_cols = {}   # stage table -> set(columns)
        self.passthrough = {}  # step name -> base ref it exposes unprojected
        self.result = None
        self.id_columns = []
        self.partition_columns = []
        self.write_mode = "upsert"
        self.var_step = {}     # python var -> latest step name

    def parse(self):
        tree = ast.parse(open(self.path).read())
        for stmt in self.walk_stmts(tree.body):
            self.stmt(stmt)
        return {
            "name": self.name, "layer": self.layer,
            "sources": sorted(self.sources.values(),
                              key=lambda s: (s["layer"], s["name"], s["principal"])),
            "steps": self.steps, "result": self.result,
            "idColumns": self.id_columns,
            "partitionColumns": self.partition_columns,
            "writeMode": self.write_mode,
        }

    def walk_stmts(self, body):
        for s in body:
            if isinstance(s, ast.Try):
                yield from self.walk_stmts(s.body)
            elif isinstance(s, (ast.Assign, ast.Expr)):
                yield s

    def stmt(self, s):
        if isinstance(s, ast.Assign):
            tgt = s.targets[0]
            if not isinstance(tgt, ast.Name):
                return
            var = tgt.id
            v = s.value
            if var in ("spark_controller", "target_table_name"):
                return
            if isinstance(v, (ast.Constant, ast.JoinedStr, ast.Dict)):
                return
            # PERIODOS / window vars / read_table / chains
            if self.is_controller_call(v, "get_periods"):
                return
            if self.is_controller_call(v, "read_table"):
                lyr = v.args[0].attr  # data_paths.X
                tbl = v.args[1].value
                principal = any(kw.arg == "have_principal" and
                                getattr(kw.value, "value", False)
                                for kw in v.keywords)
                key = var
                self.sources[key] = {"name": tbl, "layer": lyr,
                                     "principal": bool(principal),
                                     "var": var}
                return
            if self.is_window(v):
                self.windows[var] = self.u.window_spec(v)
                return
            if var == "list_cod_pais":
                # m_pais: collect->isin; modeled as IN-table filter
                self.var_step[var] = "__LIST__m_compania.cod_pais"
                return
            if isinstance(v, (ast.List, ast.Constant)):
                if var == "id_columns":
                    self.id_columns = [e.value for e in v.elts]
                elif var == "partition_columns_array":
                    self.partition_columns = [e.value for e in v.elts]
                return
            # DataFrame chain
            try:
                ops = self.chain_ops(v)
            except ValueError as e:
                raise ValueError(f"{self.name}: step {var}: {e}")
            self.add_step(var, ops)
        elif isinstance(s, ast.Expr):
            v = s.value
            if self.is_controller_call(v, "upsert"):
                self.write_mode = "upsert"
                self.result = self.refname(v.args[0].id)
                self.id_columns = [e.value for e in v.args[3].elts] \
                    if isinstance(v.args[3], ast.List) else self.id_columns
                pc = v.args[4] if len(v.args) > 4 else None
                if isinstance(pc, ast.List):
                    self.partition_columns = [e.value for e in pc.elts]
            elif self.is_controller_call(v, "write_table"):
                self.write_mode = "write"
                self.result = self.refname(v.args[0].id)
                pc = v.args[3] if len(v.args) > 3 else None
                if isinstance(pc, ast.List):
                    self.partition_columns = [e.value for e in pc.elts]

    def add_step(self, var, ops):
        nm = var
        i = 2
        while nm in self.stepnames:
            nm = f"{var}__{i}"
            i += 1
        self.stepnames.add(nm)
        self.steps.append({"name": nm, "ops": ops})
        self.var_step[var] = nm
        # passthrough: a step that never projects exposes its base's columns
        # (a lone `select(base.*)` after joins counts — the join is a filter)
        base_alias = ops[0].get("alias", "")
        def transparent(o):
            if o["op"] in ("from", "filter", "orderBy", "dropDuplicates",
                           "distinct", "withColumn", "aliasAll", "join"):
                return True
            if o["op"] == "select" and len(o["cols"]) == 1:
                c = o["cols"][0]
                return (c["function"] == "default"
                        and c["source"] == f"{base_alias}.*")
            return False
        if all(transparent(o) for o in ops):
            self.passthrough[nm] = ops[0]["ref"]
        return nm

    def resolve_src(self, ref):
        """Follow passthrough steps down to the original ref."""
        seen = set()
        while ref in self.passthrough and ref not in seen:
            seen.add(ref)
            ref = self.passthrough[ref]
        return ref

    def refname(self, var):
        """Resolve a python var to a step name or source table ref."""
        if var in self.var_step:
            return self.var_step[var]
        if var in self.sources:
            return "src:" + var
        raise ValueError(f"unresolved ref {var}")

    def is_controller_call(self, v, method):
        return (isinstance(v, ast.Call) and isinstance(v.func, ast.Attribute)
                and v.func.attr == method
                and isinstance(v.func.value, ast.Name)
                and v.func.value.id == "spark_controller")

    def is_window(self, v):
        node = v
        while isinstance(node, ast.Call) and isinstance(node.func,
                                                        ast.Attribute):
            node = node.func.value
        return isinstance(node, ast.Name) and node.id == "Window"

    def ref_of(self, node, hint="anon"):
        """Any DataFrame-valued node -> a ref name (source var, step, or
        a freshly materialized anonymous step for inline chains)."""
        if isinstance(node, ast.Name):
            return self.refname(node.id)
        if self.is_controller_call(node, "read_table"):
            lyr = node.args[0].attr
            tbl = node.args[1].value
            var = f"__inline_{tbl}"
            if var not in self.sources:
                principal = any(kw.arg == "have_principal" and
                                getattr(kw.value, "value", False)
                                for kw in node.keywords)
                self.sources[var] = {"name": tbl, "layer": lyr,
                                     "principal": bool(principal),
                                     "var": var}
            return "src:" + var
        # inline chain: materialize as an anonymous step
        ops = self.chain_ops(node)
        return self.add_step(f"__{hint}", ops)

    # ---- chain walking
    def chain_ops(self, v):
        """Linearize a method chain into ops (innermost first)."""
        calls = []
        node = v
        while (isinstance(node, ast.Call)
               and isinstance(node.func, ast.Attribute)
               and not self.is_controller_call(node, "read_table")):
            calls.append((node.func.attr, node))
            node = node.func.value
        calls.reverse()
        base = self.ref_of(node, hint="base")
        ops = []
        i = 0
        rstart = len(self.refs)
        # leading .alias("x")
        alias = ""
        if calls and calls[0][0] == "alias":
            alias = calls[0][1].args[0].value
            i = 1
        ops.append({"op": "from", "ref": base, "alias": alias})
        while i < len(calls):
            attr, c = calls[i]
            if attr == "join":
                ops.append(self.join_op(c))
            elif attr in ("filter", "where"):
                ops.append({"op": "filter", "expr": self.filter_sql(c.args[0])})
            elif attr == "select":
                cols = [select_col(self.u, a) for a in c.args]
                ops.append({"op": "select", "cols": cols})
            elif attr in ("groupBy", "groupby"):
                keys = [self.group_key(a) for a in c.args]
                # next call must be agg
                i += 1
                aggattr, aggc = calls[i]
                assert aggattr == "agg", "groupBy not followed by agg"
                aggs = [select_col(self.u, a) for a in aggc.args]
                ops.append({"op": "groupBy", "keys": keys, "aggs": aggs})
            elif attr == "withColumn":
                ops.append({"op": "withColumn", "name": c.args[0].value,
                            "expr": self.u.sql(c.args[1])})
            elif attr == "union":
                ops.append({"op": "union",
                            "ref": self.ref_of(c.args[0], hint="union")})
            elif attr == "unionByName":
                ops.append({"op": "unionByName",
                            "ref": self.ref_of(c.args[0], hint="union")})
            elif attr in ("cache", "persist", "checkpoint"):
                pass
            elif attr == "distinct":
                ops.append({"op": "distinct"})
            elif attr == "dropDuplicates":
                cols = []
                if c.args:
                    cols = [e.value for e in c.args[0].elts]
                ops.append({"op": "dropDuplicates", "subset": cols})
            elif attr == "orderBy":
                ops.append({"op": "orderBy",
                            "keys": [self.u.order_arg(a) for a in c.args]})
            elif attr == "alias":
                ops.append({"op": "aliasAll", "alias": c.args[0].value})
            else:
                raise ValueError(f"chain op {attr}")
            if ops:
                ops[-1].setdefault("_refs", []).extend(self.refs[rstart:])
            rstart = len(self.refs)
            i += 1
        self.attribute_columns(ops)
        for o in ops:
            o.pop("_refs", None)
        return ops

    # ---- stage-schema extraction (drives StageSynth)
    def source_table(self, ref):
        """ref -> BIGMAGIC stage table name, or None."""
        if not ref.startswith("src:"):
            return None
        s = self.sources.get(ref[4:])
        return s["name"] if s and s["layer"] == "BIGMAGIC" else None

    def attr_col(self, ref, colname):
        t = self.source_table(self.resolve_src(ref))
        if (t is not None and colname and colname != "*"
                and not colname.startswith("__")):
            self.stage_cols.setdefault(t, set()).add(colname)

    def attribute_columns(self, ops):
        """Positional attribution: refs collected while unparsing each op
        are attributed against the alias scope AT that op; bare refs reach
        the base table only while no projection has happened yet (a select
        or groupBy renames the namespace for every LATER op)."""
        aliasmap = {}
        base_ref = ops[0]["ref"]
        if ops[0].get("alias"):
            aliasmap[ops[0]["alias"]] = base_ref
        # aliases are chain-scoped, not positional: pre-register them all
        for o in ops:
            if o["op"] == "join" and o.get("alias"):
                aliasmap[o["alias"]] = o["ref"]
        projected = False
        for o in ops:
            refs = list(o.get("_refs", []))
            if o["op"] == "join":
                for uc in o.get("using", []):
                    self.attr_col(base_ref, uc)
                    self.attr_col(o["ref"], uc)
            for c in o.get("cols", []) + o.get("aggs", []):
                if c["function"] == "default" and c["source"]:
                    refs.append(c["source"])
            if o["op"] == "groupBy":
                refs.extend(k for k in o["keys"] if isinstance(k, str))
            if o["op"] == "dropDuplicates" and not projected:
                for sc in o.get("subset", []):
                    self.attr_col(base_ref, sc)
            for r in refs:
                if "." in r:
                    a, c = r.split(".", 1)
                    if a in aliasmap:
                        self.attr_col(aliasmap[a], c)
                elif not projected:
                    self.attr_col(base_ref, r)
            if o["op"] in ("select", "groupBy"):
                projected = True

    def group_key(self, a):
        """Grouping keys may be aliased (groupBy(coalesce(x,'').alias(n)))
        — keep the alias so post-agg selects resolve the key by name."""
        if (isinstance(a, ast.Call) and isinstance(a.func, ast.Attribute)
                and a.func.attr == "alias"):
            return f"{self.u.sql(a.func.value)} AS {a.args[0].value}"
        return self.u.order_arg(a)

    def filter_sql(self, a):
        # special-case: col("cod_pais").isin(list_cod_pais)
        if (isinstance(a, ast.Call) and isinstance(a.func, ast.Attribute)
                and a.func.attr == "isin" and len(a.args) == 1
                and isinstance(a.args[0], ast.Name)
                and a.args[0].id == "list_cod_pais"):
            colsql = self.u.sql(a.func.value)
            self.stage_cols.setdefault("m_compania", set()).add("cod_pais")
            return f"__SEMI__ {colsql} IN m_compania.cod_pais"
        return self.u.sql(a)

    def join_op(self, c):
        other = c.args[0]
        alias = ""
        if (isinstance(other, ast.Call) and isinstance(other.func,
                                                       ast.Attribute)
                and other.func.attr == "alias"):
            alias = other.args[0].value
            other = other.func.value
        ref = self.ref_of(other, hint="join")
        jt = c.args[2].value if len(c.args) > 2 else "inner"
        onarg = c.args[1]
        if isinstance(onarg, ast.Constant) and isinstance(onarg.value, str):
            return {"op": "join", "ref": ref, "alias": alias, "type": jt,
                    "using": [onarg.value]}
        if isinstance(onarg, ast.List) and all(
                isinstance(e, ast.Constant) for e in onarg.elts):
            return {"op": "join", "ref": ref, "alias": alias, "type": jt,
                    "using": [e.value for e in onarg.elts]}
        return {"op": "join", "ref": ref, "alias": alias, "type": jt,
                "on": self.u.sql(onarg)}


def main():
    os.makedirs(OUT, exist_ok=True)
    jobs = []
    errors = []
    parsers = []
    for layer, sub in (("dominio", "domain"), ("comercial", "analytics")):
        d = os.path.join(REF, sub)
        for fn in sorted(os.listdir(d)):
            if not fn.endswith(".py"):
                continue
            p = JobParser(os.path.join(d, fn), layer)
            try:
                jobs.append(p.parse())
                parsers.append(p)
            except Exception as e:
                errors.append(f"{fn}: {e}")
    # manual corrections to latent reference bugs (documented in
    # SURVEY/Scaladoc): t_movimiento_inventario_detalle line 70 references
    # alias `tmi` which is never bound in that join (only tmid/mda/mc/mp/
    # ma) — the job would crash as written; the evident intent is the
    # detalle's own estado-of-comprobante column.
    # (job, broken ref as written, evident intent) — each would raise
    # UNRESOLVED_COLUMN in the reference itself; see SURVEY round-5 notes
    FIXES = [
        ("t_movimiento_inventario_detalle",
         "tmi.cod_estado_comprobante", "tmid.cod_estado_comprobante"),
        ("t_venta_detalle", "tv.id_operacion", "tvd.id_operacion"),
    ]
    for i, j in enumerate(jobs):
        raw = json.dumps(j)
        for (jn, old, new) in FIXES:
            if j["name"] == jn:
                raw = raw.replace(old, new)
        jobs[i] = json.loads(raw)
    # t_venta_detalle selects tvd.precio_paquete TWICE in one select
    # (lines 188+197) — duplicate output attribute makes every later bare
    # reference ambiguous (crash as written); keep the first.
    for j in jobs:
        if j["name"] != "t_venta_detalle":
            continue
        for st in j["steps"]:
            for o in st["ops"]:
                if o["op"] != "select":
                    continue
                seen = set()
                kept = []
                for c in o["cols"]:
                    key = (c["target"], c["source"])
                    if c["target"] == "precio_paquete" and key in seen:
                        continue
                    seen.add(key)
                    kept.append(c)
                o["cols"] = kept
    with open(os.path.join(OUT, "jobs.json"), "w") as f:
        json.dump(jobs, f, indent=1, sort_keys=True)
    # referenced stage columns report (drives StageSynth)
    merged = {}
    for p in parsers:
        for t, cols in p.stage_cols.items():
            merged.setdefault(t, set()).update(cols)
    # manual corrections: columns the bare-ref heuristic attributes to the
    # step base but which the reference resolves from a JOINED table
    # (m_estructura_comercial division branch: cod_sucursal is mzd's)
    merged.get("m_division", set()).discard("cod_sucursal")
    merged.setdefault("t_movimiento_inventario_detalle", set()).add(
        "cod_estado_comprobante")
    # 'orden' is t_reparto's own withColumn product, not a stage column
    merged.get("t_movimiento_inventario", set()).discard("orden")
    with open(os.path.join(OUT, "stage_columns.json"), "w") as f:
        json.dump({t: sorted(c) for t, c in sorted(merged.items())},
                  f, indent=1)
    ncols = sum(len(c) for c in merged.values())
    print(f"transcribed {len(jobs)} jobs, {len(errors)} errors; "
          f"{len(merged)} stage tables, {ncols} columns")
    for e in errors:
        print("  ERR", e)


if __name__ == "__main__":
    main()
