package graft.shacl

import graft.rdf._

/** Default (generic) result messages when a shape declares no sh:message —
  * templates mirror the reference's per-component make_generic_messages
  * (e.g. value_constraints.py:84-87,197,305; value_range_constraints.py;
  * string_based_constraints.py; cardinality_constraints.py:172;
  * other_constraints.py:75,159,312; property_pair_constraints.py;
  * shape_based_constraints.py:171-175). Node rendering uses canonical term
  * keys (the reference renders curies via its namespace manager; message
  * text is informational, not compared, unless expected reports carry it).
  */
object GenericMessages {
  import ConstraintIR._

  private def ns(n: Node): String = n.key

  def forResult(shape: ShapeIR, component: Iri, value: Option[Node],
                pathKey: Option[String]): Option[String] = {
    def one[T <: ConstraintIR](pf: PartialFunction[ConstraintIR, String]): Option[String] =
      shape.constraints.collectFirst(pf)
    val v = value.map(ns).getOrElse("")
    component match {
      case SH.ClassConstraintComponent => one {
        case CClass(List(c)) => s"Value does not have class ${ns(c)}"
        case CClass(cs) => s"Value class is not in classes (${cs.map(ns).mkString(", ")})"
      }
      case SH.DatatypeConstraintComponent => one {
        case CDatatype(dt) => s"Value is not Literal with datatype ${ns(dt)}"
      }
      case SH.NodeKindConstraintComponent => one {
        case CNodeKind(k) => s"Value is not of Node Kind ${ns(k)}"
      }
      case SH.MinCountConstraintComponent => one {
        case CMinCount(n) => s"Less than $n values on ${pathKey.getOrElse("")}"
      }
      case SH.MaxCountConstraintComponent => one {
        case CMaxCount(n) => s"More than $n values on ${pathKey.getOrElse("")}"
      }
      case SH.MinExclusiveConstraintComponent => one {
        case CRange(-2, b, _) => s"Value is not > ${ns(b)}"
      }
      case SH.MinInclusiveConstraintComponent => one {
        case CRange(-1, b, _) => s"Value is not >= ${ns(b)}"
      }
      case SH.MaxInclusiveConstraintComponent => one {
        case CRange(1, b, _) => s"Value is not <= ${ns(b)}"
      }
      case SH.MaxExclusiveConstraintComponent => one {
        case CRange(2, b, _) => s"Value is not < ${ns(b)}"
      }
      case SH.MinLengthConstraintComponent => one {
        case CMinLength(n) => s"String length not >= $n"
      }
      case SH.MaxLengthConstraintComponent => one {
        case CMaxLength(n) => s"String length not <= $n"
      }
      case SH.PatternConstraintComponent => one {
        case CPattern(p, _) => s"Value does not match pattern '$p'"
      }
      case SH.LanguageInConstraintComponent => one {
        case CLanguageIn(ls) => s"String language is not in (${ls.mkString(", ")})"
      }
      case SH.UniqueLangConstraintComponent =>
        Some("More than one String shares the same Language")
      case SH.EqualsConstraintComponent => one {
        case CEquals(ps) => s"Value of ${ns(ps.head)} != $v"
      }
      case SH.DisjointConstraintComponent => one {
        case CDisjoint(ps) => s"Value of ${ns(ps.head)} == $v"
      }
      case SH.LessThanConstraintComponent => one {
        case CLessThan(ps, false) => s"Value of ${ns(ps.head)} <= $v"
      }
      case SH.LessThanOrEqualsConstraintComponent => one {
        case CLessThan(ps, true) => s"Value of ${ns(ps.head)} < $v"
      }
      case SH.NotConstraintComponent => one {
        case CNot(List(n)) => s"Node $v must not conform to shape ${ns(n)}"
        case CNot(nlist) => s"Node $v must not conform to any shapes in ${nlist.map(ns).mkString(" , ")}"
      }
      case SH.AndConstraintComponent => one {
        case CAnd(ls) => s"Node $v must conform to all shapes in ${ls.flatten.map(ns).mkString(" , ")}"
      }
      case SH.OrConstraintComponent => one {
        case COr(ls) => s"Node $v must conform to one or more shapes in ${ls.flatten.map(ns).mkString(" , ")}"
      }
      case SH.XoneConstraintComponent => one {
        case CXone(ls) => s"Node $v must conform to exactly one shape in ${ls.flatten.map(ns).mkString(" , ")}"
      }
      case SH.NodeConstraintComponent => one {
        case CNode(List(n)) => s"Value does not conform to Shape ${ns(n)}. See details for more information."
        case CNode(nlist) => s"Value must conform to every Shape in ('${nlist.map(ns).mkString("', '")}'). See details for more information."
      }
      case SH.ClosedConstraintComponent =>
        Some(s"Node is closed. It cannot have value: $v")
      case SH.HasValueConstraintComponent => one {
        case CHasValue(hs) => s"Node ${pathKey.getOrElse("")} does not contain a value in the set: ${hs.map(ns).mkString("[", ", ", "]")}"
      }
      case SH.InConstraintComponent => one {
        case CIn(vs) => s"Value $v not in list ${vs.map(ns).mkString("[", ", ", "]")}"
      }
      case SH.QualifiedMinCountConstraintComponent | SH.QualifiedMaxCountConstraintComponent =>
        one { case CQualified(s2, min, max, _) =>
          s"Focus node does not conform to shape ${ns(s2)}" +
            min.map(m => s" MinCount $m").getOrElse("") + max.map(m => s" MaxCount $m").getOrElse("")
        }
      case SH.ExpressionConstraintComponent =>
        Some("Expression evaluation generated constraint did not return true.")
      case _ => None
    }
  }
}
