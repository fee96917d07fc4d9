"""Minimal pure-stdlib XSD structural validator.

The reference validates serialized ALTO/PageXML against the official W3C
schemas with lxml's XMLSchema (/root/reference/tests/test_serialization.py:
51-73, resources alto-4-3.xsd / pagecontent.xsd / xlink.xsd). Neither lxml
nor xmlschema ship in this environment, so this module implements the
subset of XML Schema those three schema documents actually use (measured:
element/complexType/simpleType/sequence/choice/group/attribute/
attributeGroup/complexContent/simpleContent/extension/restriction/list/
union/any/import — no xs:all, no anyAttribute, no substitution groups,
no xsi:type) and validates:

- document structure: every element matches a declaration; children match
  the declared content model (sequences/choices with minOccurs/maxOccurs,
  matched by a memoized backtracking matcher — documents are small);
- attributes: required attributes present, no undeclared attributes
  (xsi:* and xmlns always allowed), values checked against simple types
  (builtins + enumeration/pattern/min-max/length facets, lists, unions);
- text content: simpleContent / simple-typed elements checked, element-only
  content must contain only whitespace text;
- ID uniqueness across the document (the part the reference tests check
  separately with a Counter).

Full XSD semantics (identity constraints, substitution groups, complex-type
restriction particle checking) are intentionally out of scope — this
matches what lxml validation catches on kraken-style ALTO/PageXML output
in practice: wrong/missing/misordered elements, unknown or missing
attributes, enum/range/format violations.
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

XS = "http://www.w3.org/2001/XMLSchema"
XSI = "http://www.w3.org/2001/XMLSchema-instance"
XML_NS = "http://www.w3.org/XML/1998/namespace"


def _split(tag: str) -> tuple[str | None, str]:
    if tag.startswith("{"):
        ns, local = tag[1:].split("}", 1)
        return ns, local
    return None, tag


_NCNAME = re.compile(r"[^\s:]+$")
_DATETIME = re.compile(
    r"-?\d{4,}-\d2-\d2T\d2:\d2:\d2(\.\d+)?(Z|[+-]\d2:\d2)?$".replace(r"\d2", r"\d{2}")
)


def _check_builtin(name: str, value: str) -> bool:
    """Validator for the XML Schema builtin simple types the three schemas
    reference. Unknown builtins accept anything (permissive fallback)."""
    v = value.strip()
    try:
        if name in ("string", "normalizedString", "token", "anySimpleType", "anyType"):
            return True
        if name in ("ID", "IDREF", "NCName", "Name", "NMTOKEN"):
            return bool(_NCNAME.match(v))
        if name in ("IDREFS", "NMTOKENS"):
            return bool(v) and all(_NCNAME.match(t) for t in v.split())
        if name == "anyURI":
            return True
        if name == "boolean":
            return v in ("true", "false", "0", "1")
        if name in ("integer", "long", "int", "short", "byte", "negativeInteger"):
            int(v)
            return True
        if name in ("nonNegativeInteger", "unsignedLong", "unsignedInt", "unsignedShort", "unsignedByte"):
            return int(v) >= 0
        if name == "positiveInteger":
            return int(v) > 0
        if name in ("float", "double", "decimal"):
            if v in ("INF", "-INF", "NaN"):
                return name != "decimal"
            float(v)
            return True
        if name == "dateTime":
            return bool(_DATETIME.match(v))
        if name == "date":
            return bool(re.match(r"-?\d{4,}-\d{2}-\d{2}(Z|[+-]\d{2}:\d{2})?$", v))
        if name == "duration":
            return bool(re.match(r"-?P(?=.)(\d+Y)?(\d+M)?(\d+D)?(T(?=.)(\d+H)?(\d+M)?(\d+(\.\d+)?S)?)?$", v))
        return True
    except ValueError:
        return False


def _xsd_pattern_to_re(p: str) -> str:
    """XML Schema regex -> Python re (anchored). The schemas use only
    features shared with Python syntax plus \\c (name chars) and \\i."""
    p = p.replace(r"\i", r"[^\d\W]").replace(r"\c", r"[-.\w:]")
    return p + r"\Z"


class XsdError(ValueError):
    pass


class _Node:
    """A schema component: the raw ET element plus its file's prefix map
    and default namespace (for resolving QName-valued attributes)."""

    __slots__ = ("el", "nsmap", "default_ns", "target_ns")

    def __init__(self, el, nsmap, default_ns, target_ns):
        self.el, self.nsmap, self.default_ns, self.target_ns = el, nsmap, default_ns, target_ns

    def qname(self, ref: str) -> tuple[str | None, str]:
        if ":" in ref:
            pfx, local = ref.split(":", 1)
            if pfx not in self.nsmap:
                raise XsdError(f"unknown prefix {pfx!r} in {ref!r}")
            return self.nsmap[pfx], local
        return self.default_ns, ref

    def sub(self, el) -> "_Node":
        return _Node(el, self.nsmap, self.default_ns, self.target_ns)

    def children(self, *locals_):
        want = {f"{{{XS}}}{l}" for l in locals_}
        return [self.sub(c) for c in self.el if c.tag in want]

    def first(self, *locals_):
        c = self.children(*locals_)
        return c[0] if c else None


class Schema:
    """One logical schema: a target file plus everything it imports."""

    def __init__(self):
        self.elements: dict[tuple, _Node] = {}
        self.types: dict[tuple, _Node] = {}
        self.groups: dict[tuple, _Node] = {}
        self.attr_groups: dict[tuple, _Node] = {}
        self.attributes: dict[tuple, _Node] = {}
        self.target_ns: str | None = None

    # ------------------------------------------------------------ loading

    @classmethod
    def load(cls, path: str) -> "Schema":
        s = cls()
        s._load_file(path, set())
        if s.target_ns is None:
            raise XsdError(f"no targetNamespace in {path}")
        return s

    def _load_file(self, path: str, seen: set) -> None:
        path = os.path.abspath(path)
        if path in seen:
            return
        seen.add(path)
        nsmap: dict[str, str] = {}
        default_ns = None
        events = ET.iterparse(path, events=("start-ns", "start"))
        root = None
        for ev, obj in events:
            if ev == "start-ns":
                pfx, uri = obj
                if pfx:
                    nsmap[pfx] = uri
                else:
                    default_ns = uri
            elif root is None:
                root = obj
        tns = root.get("targetNamespace")
        if self.target_ns is None:
            self.target_ns = tns
        node = _Node(root, nsmap, default_ns, tns)
        for child in root:
            ns_, local = _split(child.tag)
            if ns_ != XS:
                continue
            cn = node.sub(child)
            name = child.get("name")
            if local == "element" and name:
                self.elements[(tns, name)] = cn
            elif local in ("complexType", "simpleType") and name:
                self.types[(tns, name)] = cn
            elif local == "group" and name:
                self.groups[(tns, name)] = cn
            elif local == "attributeGroup" and name:
                self.attr_groups[(tns, name)] = cn
            elif local == "attribute" and name:
                self.attributes[(tns, name)] = cn
            elif local in ("import", "include"):
                loc = child.get("schemaLocation")
                if loc:
                    cand = os.path.join(os.path.dirname(path), os.path.basename(loc))
                    if os.path.exists(cand):
                        self._load_file(cand, seen)
                    # unresolvable imports (absolute URLs with no local
                    # copy) leave that namespace lax-validated

    # --------------------------------------------------------- validation

    def validate(self, doc: ET.Element) -> list[str]:
        """Returns a list of violation strings (empty == valid)."""
        errors: list[str] = []
        ns, local = _split(doc.tag)
        decl = self.elements.get((ns, local))
        if decl is None:
            return [f"no global element declaration for root {{{ns}}}{local}"]
        self._validate_element(doc, decl, errors, path=local)
        # document-wide ID uniqueness
        seen_ids: dict[str, int] = {}
        for el in doc.iter():
            for k, v in el.attrib.items():
                if _split(k)[1] in ("ID", "id") and _split(k)[0] in (None,):
                    seen_ids[v] = seen_ids.get(v, 0) + 1
        dups = [i for i, c in seen_ids.items() if c > 1]
        if dups:
            errors.append(f"duplicate ID values: {dups[:5]}")
        return errors

    def assert_valid(self, doc: ET.Element) -> None:
        errs = self.validate(doc)
        if errs:
            raise XsdError("; ".join(errs[:10]))

    # ---------------------------------------------------- type resolution

    def _resolve_type(self, node: _Node, ref: str) -> _Node | tuple[str, str]:
        ns, local = node.qname(ref)
        if ns == XS:
            return ("builtin", local)
        t = self.types.get((ns, local))
        if t is None:
            raise XsdError(f"unresolved type {ref!r}")
        return t

    def _element_decl(self, node: _Node) -> _Node:
        ref = node.el.get("ref")
        if ref:
            ns, local = node.qname(ref)
            decl = self.elements.get((ns, local))
            if decl is None:
                raise XsdError(f"unresolved element ref {ref!r}")
            return decl
        return node

    def _type_of_element(self, decl: _Node):
        tref = decl.el.get("type")
        if tref:
            return self._resolve_type(decl, tref)
        inline = decl.first("complexType", "simpleType")
        if inline is not None:
            return inline
        return ("builtin", "anyType")

    # ------------------------------------------------------ simple types

    def _check_simple(self, t, value: str) -> bool:
        if isinstance(t, tuple):  # builtin
            return _check_builtin(t[1], value)
        el = t.el
        local = _split(el.tag)[1]
        if local == "simpleType":
            lst = t.first("list")
            if lst is not None:
                item = lst.el.get("itemType")
                it = self._resolve_type(lst, item) if item else lst.first("simpleType")
                toks = value.split()
                return all(self._check_simple(it, tok) for tok in toks)
            uni = t.first("union")
            if uni is not None:
                members = []
                mt = uni.el.get("memberTypes")
                if mt:
                    members += [self._resolve_type(uni, m) for m in mt.split()]
                members += uni.children("simpleType")
                return any(self._check_simple(m, value) for m in members)
            restr = t.first("restriction")
            if restr is not None:
                return self._check_restriction(restr, value)
            return True
        raise XsdError(f"not a simple type: {local}")

    def _check_restriction(self, restr: _Node, value: str) -> bool:
        base = restr.el.get("base")
        bt = self._resolve_type(restr, base) if base else restr.first("simpleType")
        # whiteSpace collapse is the norm in these schemas
        v = " ".join(value.split())
        if bt is not None and not self._check_simple(bt, v):
            return False
        enums = [c.el.get("value") for c in restr.children("enumeration")]
        if enums and v not in enums:
            return False
        for pat in restr.children("pattern"):
            if not re.match(_xsd_pattern_to_re(pat.el.get("value")), v):
                return False
        try:
            for facet, op in (
                ("minInclusive", lambda a, b: a >= b),
                ("maxInclusive", lambda a, b: a <= b),
                ("minExclusive", lambda a, b: a > b),
                ("maxExclusive", lambda a, b: a < b),
            ):
                f = restr.first(facet)
                if f is not None and not op(float(v), float(f.el.get("value"))):
                    return False
        except ValueError:
            return False
        for facet, op in (
            ("length", lambda n, m: n == m),
            ("minLength", lambda n, m: n >= m),
            ("maxLength", lambda n, m: n <= m),
        ):
            f = restr.first(facet)
            if f is not None and not op(len(v), int(f.el.get("value"))):
                return False
        return True

    # -------------------------------------------------------- attributes

    def _collect_attr_uses(self, t: _Node, uses: dict, seen: set) -> None:
        """Walk a complexType (through extension/restriction/attributeGroup)
        collecting attribute uses: (ns, name) -> (type, use)."""
        key = id(t.el)
        if key in seen:
            return
        seen.add(key)
        content = t.first("complexContent", "simpleContent")
        scope = content if content is not None else t
        deriv = scope.first("extension", "restriction") if content is not None else None
        for holder in filter(None, (deriv if deriv is not None else scope,)):
            base = holder.el.get("base") if deriv is not None else None
            if base:
                bt = self._resolve_type(holder, base)
                if not isinstance(bt, tuple):
                    self._collect_attr_uses(bt, uses, seen)
            for a in holder.children("attribute"):
                ref = a.el.get("ref")
                if ref:
                    ns, local = a.qname(ref)
                    decl = self.attributes.get((ns, local))
                    if decl is None:
                        # e.g. xml:space with no imported schema — lax
                        uses[(ns, local)] = (("builtin", "string"), a.el.get("use", "optional"))
                        continue
                    uses[(ns, local)] = (self._attr_type(decl), a.el.get("use", "optional"))
                else:
                    name = a.el.get("name")
                    use = a.el.get("use", "optional")
                    # attributeFormDefault is unqualified in all three files
                    if use == "prohibited":
                        uses.pop((None, name), None)
                    else:
                        uses[(None, name)] = (self._attr_type(a), use)
            for g in holder.children("attributeGroup"):
                ref = g.el.get("ref")
                if ref:
                    ns, local = g.qname(ref)
                    grp = self.attr_groups.get((ns, local))
                    if grp is None:
                        raise XsdError(f"unresolved attributeGroup {ref!r}")
                    self._collect_attr_uses_from_group(grp, uses)

    def _collect_attr_uses_from_group(self, grp: _Node, uses: dict) -> None:
        for a in grp.children("attribute"):
            ref = a.el.get("ref")
            if ref:
                ns, local = a.qname(ref)
                decl = self.attributes.get((ns, local))
                typ = self._attr_type(decl) if decl is not None else ("builtin", "string")
                uses[(ns, local)] = (typ, a.el.get("use", "optional"))
            else:
                # globally-declared attrs inside a group of a foreign-ns
                # schema (xlink) are namespace-qualified by its form rules;
                # xlink.xsd declares them globally -> qualified
                ns = grp.target_ns if grp.target_ns != self.target_ns else None
                uses[(ns, a.el.get("name"))] = (self._attr_type(a), a.el.get("use", "optional"))
        for g in grp.children("attributeGroup"):
            ref = g.el.get("ref")
            if ref:
                ns, local = g.qname(ref)
                sub = self.attr_groups.get((ns, local))
                if sub is not None:
                    self._collect_attr_uses_from_group(sub, uses)

    def _attr_type(self, a: _Node):
        tref = a.el.get("type")
        if tref:
            return self._resolve_type(a, tref)
        inline = a.first("simpleType")
        return inline if inline is not None else ("builtin", "string")

    # ----------------------------------------------------- content model

    def _particles(self, scope: _Node) -> list:
        """Compile the child particles of a model-group scope into a list
        of (kind, payload, minOccurs, maxOccurs) tuples."""
        out = []
        for c in scope.children("sequence", "choice", "element", "group", "any"):
            local = _split(c.el.tag)[1]
            mn = int(c.el.get("minOccurs", "1"))
            mx_raw = c.el.get("maxOccurs", "1")
            mx = -1 if mx_raw == "unbounded" else int(mx_raw)
            if local in ("sequence", "choice"):
                out.append((local, self._particles(c), mn, mx))
            elif local == "element":
                decl = self._element_decl(c)
                ens = decl.target_ns  # elementFormDefault=qualified
                out.append(("elem", (ens, decl.el.get("name"), decl), mn, mx))
            elif local == "group":
                ref = c.el.get("ref")
                ns, gname = c.qname(ref)
                grp = self.groups.get((ns, gname))
                if grp is None:
                    raise XsdError(f"unresolved group {ref!r}")
                inner = grp.first("sequence", "choice")
                kind = _split(inner.el.tag)[1]
                out.append((kind, self._particles(inner), mn, mx))
            elif local == "any":
                out.append(("any", None, mn, mx))
        return out

    def _content_model(self, t: _Node):
        """(particles, mixed, simple_type_or_None) for a complexType."""
        mixed = t.el.get("mixed") == "true"
        sc = t.first("simpleContent")
        if sc is not None:
            deriv = sc.first("extension", "restriction")
            base = deriv.el.get("base")
            bt = self._resolve_type(deriv, base)
            # simpleContent base may itself be a complexType w/ simpleContent
            while not isinstance(bt, tuple) and _split(bt.el.tag)[1] == "complexType":
                inner = bt.first("simpleContent")
                d2 = inner.first("extension", "restriction")
                bt = self._resolve_type(d2, d2.el.get("base"))
            return [], True, bt
        cc = t.first("complexContent")
        if cc is not None:
            deriv = cc.first("extension", "restriction")
            base = deriv.el.get("base")
            parts = []
            bt = self._resolve_type(deriv, base)
            if not isinstance(bt, tuple):
                bparts, bmixed, _ = self._content_model(bt)
                parts += bparts
                mixed = mixed or bmixed or cc.el.get("mixed") == "true"
            own = deriv.first("sequence", "choice")
            if own is not None:
                kind = _split(own.el.tag)[1]
                mn = int(own.el.get("minOccurs", "1"))
                mx_raw = own.el.get("maxOccurs", "1")
                mx = -1 if mx_raw == "unbounded" else int(mx_raw)
                parts.append((kind, self._particles(own), mn, mx))
            return parts, mixed, None
        own = t.first("sequence", "choice")
        if own is not None:
            kind = _split(own.el.tag)[1]
            mn = int(own.el.get("minOccurs", "1"))
            mx_raw = own.el.get("maxOccurs", "1")
            mx = -1 if mx_raw == "unbounded" else int(mx_raw)
            return [(kind, self._particles(own), mn, mx)], mixed, None
        return [], mixed, None

    # -------------------------------------------------------- matching

    def _match_particle(self, p, names: list, i: int, memo: dict) -> set:
        """Positions reachable from i after consuming between minOccurs and
        maxOccurs occurrences of the particle. The particle tree is acyclic
        (no recursive groups in these schemas), so memoization is a pure
        cache."""
        key = (id(p), i)
        hit = memo.get(key)
        if hit is not None:
            return hit
        kind, payload, mn, mx = p
        results: set = {i} if mn == 0 else set()
        current = {i}
        visited = {i}
        k = 0
        while current and (mx == -1 or k < mx):
            nxt = set()
            for j in current:
                nxt |= self._match_one(kind, payload, names, j, memo)
            k += 1
            if k >= mn:
                results |= nxt
            new = nxt - visited
            if mx == -1 and not new and k >= mn:
                break  # nullable inner model: no progress possible
            visited |= new
            current = nxt
        memo[key] = results
        return results

    def _match_one(self, kind, payload, names, i, memo) -> set:
        if kind == "elem":
            ens, ename, _decl = payload
            if i < len(names) and names[i] == (ens, ename):
                return {i + 1}
            return set()
        if kind == "any":
            return {i + 1} if i < len(names) else set()
        if kind == "sequence":
            ends = {i}
            for sub in payload:
                nxt = set()
                for j in ends:
                    nxt |= self._match_particle(sub, names, j, memo)
                ends = nxt
                if not ends:
                    return set()
            return ends
        if kind == "choice":
            out = set()
            for sub in payload:
                out |= self._match_particle(sub, names, i, memo)
            return out
        raise XsdError(f"unsupported particle {kind}")

    # ------------------------------------------------------ element check

    def _validate_element(self, el: ET.Element, decl: _Node, errors: list, path: str) -> None:
        t = self._type_of_element(decl)
        text = (el.text or "") + "".join((c.tail or "") for c in el)
        if isinstance(t, tuple) or _split(t.el.tag)[1] == "simpleType":
            if len(el) > 0:
                errors.append(f"{path}: simple-typed element has children")
            if not self._check_simple(t, el.text or ""):
                errors.append(f"{path}: text {el.text!r} invalid for its simple type")
            self._validate_attrs(el, None, errors, path)
            return
        parts, mixed, simple = self._content_model(t)
        self._validate_attrs(el, t, errors, path)
        if simple is not None:
            if len(el) > 0:
                errors.append(f"{path}: simpleContent element has children")
            elif not self._check_simple(simple, el.text or ""):
                errors.append(f"{path}: text {el.text!r} invalid for simpleContent base")
            return
        if not mixed and text.strip():
            errors.append(f"{path}: unexpected text {text.strip()[:40]!r}")
        names = [_split(c.tag) for c in el]
        seq = ("sequence", parts, 1, 1)
        memo: dict = {}
        ok = len(names) in self._match_particle(seq, names, 0, memo) if parts else not names
        if not ok:
            errors.append(
                f"{path}: children {[n for _, n in names]} do not satisfy the content model"
            )
        # recurse into children that have matching declarations in scope
        decls = {}
        def collect(ps):
            for kind, payload, _, _ in ps:
                if kind == "elem":
                    ens, ename, d = payload
                    decls[(ens, ename)] = d
                elif kind in ("sequence", "choice"):
                    collect(payload)
        collect(parts)
        for c in el:
            d = decls.get(_split(c.tag))
            if d is not None:
                self._validate_element(c, d, errors, f"{path}/{_split(c.tag)[1]}")

    def _validate_attrs(self, el: ET.Element, t: _Node | None, errors: list, path: str) -> None:
        uses: dict = {}
        if t is not None:
            self._collect_attr_uses(t, uses, set())
        for k, v in el.attrib.items():
            ns, local = _split(k)
            if ns in (XSI, XML_NS):
                continue
            use = uses.get((ns, local))
            if use is None:
                errors.append(f"{path}: undeclared attribute {local!r}")
                continue
            typ, _u = use
            if not self._check_simple(typ, v):
                errors.append(f"{path}: attribute {local}={v!r} fails its type")
        for (ns, local), (_typ, u) in uses.items():
            if u == "required":
                key = local if ns is None else f"{{{ns}}}{local}"
                if key not in el.attrib:
                    errors.append(f"{path}: required attribute {local!r} missing")


_CACHE: dict[str, Schema] = {}


def load_schema(path: str) -> Schema:
    s = _CACHE.get(path)
    if s is None:
        s = _CACHE[path] = Schema.load(path)
    return s


def validate_xml(doc_text: str, xsd_path: str) -> list[str]:
    """Parse + validate; returns violations (empty list == valid)."""
    root = ET.fromstring(doc_text.encode("utf-8"))
    return load_schema(xsd_path).validate(root)
