{% macro price_filter(col, min_value) -%}
{{ col }} >= {{ min_value }}
{%- endmacro %}
